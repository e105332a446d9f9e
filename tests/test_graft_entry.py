"""Driver contract: entry() must be jittable; dryrun covered separately."""

import jax
import numpy as np


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    cls_p, box_p = jax.jit(fn)(*args)
    assert cls_p.shape[1] == 13545
    assert np.isfinite(np.asarray(cls_p)).all()
