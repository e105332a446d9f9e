"""Pallas fused kernel parity vs the XLA implementation (interpret
mode on CPU; the compiled path is exercised by
benchmarks/bench_pallas.py on real hardware)."""

import jax
import jax.numpy as jnp
import numpy as np

from snn_for_object_detection_tpu.ops import neurons
from snn_for_object_detection_tpu.ops.pallas_kernels import (
    fused_pointwise_conv_bn_lif,
    xla_pointwise_conv_bn_lif,
)


def make_inputs(rng, n=256, cin=64, cout=32, dtype=jnp.float32):
    x = jnp.asarray(rng.normal(size=(n, cin)), dtype)
    w = jnp.asarray(rng.normal(size=(cin, cout)) * 0.1, dtype)
    a = jnp.asarray(rng.uniform(0.5, 1.5, (cout,)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(cout,)) * 0.1, jnp.float32)
    v = jnp.asarray(rng.normal(size=(n, cout)) * 0.4, dtype)
    i = jnp.asarray(rng.normal(size=(n, cout)) * 0.4, dtype)
    return x, w, a, b, v, i


def test_pallas_matches_xla(rng):
    args = make_inputs(rng)
    zp, vp, ip = fused_pointwise_conv_bn_lif(*args, interpret=True)
    zx, vx, ix = xla_pointwise_conv_bn_lif(*args)
    np.testing.assert_array_equal(np.asarray(zp), np.asarray(zx))
    np.testing.assert_allclose(np.asarray(vp), np.asarray(vx), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(ip), np.asarray(ix), rtol=1e-5,
                               atol=1e-6)


def test_pallas_handles_ragged_rows(rng):
    # N not a multiple of block_n: grid padding must not corrupt output
    args = make_inputs(rng, n=700)
    zp, vp, ip = fused_pointwise_conv_bn_lif(*args, block_n=512,
                                             interpret=True)
    zx, vx, ix = xla_pointwise_conv_bn_lif(*args)
    np.testing.assert_array_equal(np.asarray(zp), np.asarray(zx))
    np.testing.assert_allclose(np.asarray(ip), np.asarray(ix), rtol=1e-5,
                               atol=1e-6)


def test_xla_impl_matches_neuron_library(rng):
    """The benchmark baseline must implement the exact LIF semantics of
    ops.neurons.lif_step (which is itself tested against norse math)."""
    x, w, a, b, v, i = make_inputs(rng)
    y = jnp.dot(x, w, preferred_element_type=jnp.float32) * a + b
    z_ref, st = neurons.lif_step(y, neurons.LIFState(v, i))
    zx, vx, ix = xla_pointwise_conv_bn_lif(x, w, a, b, v, i)
    np.testing.assert_array_equal(np.asarray(zx), np.asarray(z_ref))
    np.testing.assert_allclose(np.asarray(vx), np.asarray(st.v), rtol=1e-5,
                               atol=1e-6)


# ---------------------------------------------------------------------------
# Fused temporal spiking-conv kernel: k in {1, 3} x stride in {1, 2}
# ---------------------------------------------------------------------------

import pytest

from snn_for_object_detection_tpu.models.compile import _conv2d
from snn_for_object_detection_tpu.ops.pallas_kernels import spiking_conv_seq


def _unfused_reference(x_seq, w, a, b, v0, i0, cell, stride):
    """conv -> eval-BN affine -> cell, step by step via lax.scan, with
    the production path's dtype rounding (compile._bn_eval_affine)."""
    state_dtype = v0.dtype
    step = neurons.lif_step if cell == "lif" else neurons.li_step
    state_t = neurons.LIFState if cell == "lif" else neurons.LIState

    def body(st, x_t):
        y = _conv2d(x_t, w.astype(x_t.dtype), stride, w.shape[0] // 2)
        y = y.astype(x_t.dtype).astype(jnp.float32)
        y = y * a + b
        y = y.astype(x_t.dtype)
        st32 = jax.tree.map(lambda s: s.astype(jnp.float32), st)
        out, new = step(y.astype(jnp.float32), st32)
        new = jax.tree.map(lambda s: s.astype(state_dtype), new)
        return new, out.astype(x_t.dtype)

    st, z = jax.lax.scan(body, state_t(v0, i0), x_seq)
    return z, st.v, st.i


@pytest.mark.parametrize("k,stride,cell", [
    (3, 1, "lif"), (3, 2, "lif"), (1, 1, "lif"),
    (3, 2, "li"), (1, 1, "li"), (1, 2, "lif"),
])
def test_spiking_conv_seq_matches_unfused(rng, k, stride, cell):
    T, N, H, W, cin, cout = 4, 2, 12, 19, 8, 16  # odd W: edge cols
    h_out = -(-H // stride)
    w_out = -(-W // stride)
    x = jnp.asarray(rng.random((T, N, H, W, cin)) < 0.3, jnp.float32)
    w = jnp.asarray(rng.normal(size=(k, k, cin, cout)) * 0.2, jnp.float32)
    a = jnp.asarray(rng.uniform(0.5, 1.5, (cout,)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(cout,)) * 0.1, jnp.float32)
    v0 = jnp.asarray(rng.normal(size=(N, h_out, w_out, cout)) * 0.3,
                     jnp.float32)
    i0 = jnp.asarray(rng.normal(size=(N, h_out, w_out, cout)) * 0.3,
                     jnp.float32)
    zf, vf, if_ = spiking_conv_seq(x, w, a, b, v0, i0, cell=cell,
                                   stride=stride, interpret=True)
    zr, vr, ir = _unfused_reference(x, w, a, b, v0, i0, cell, stride)
    np.testing.assert_allclose(np.asarray(zf), np.asarray(zr),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vf), np.asarray(vr),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(if_), np.asarray(ir),
                               rtol=1e-4, atol=1e-5)


def test_spiking_conv_seq_multi_image_blocks(rng):
    """N=4 at a tiny geometry selects nb>1 (the round-2 scoped-VMEM OOM
    configuration): results must match nb-independent reference."""
    from snn_for_object_detection_tpu.ops import pallas_kernels as pk

    T, N, H, W, cin, cout = 3, 4, 8, 9, 8, 8
    nb = pk._pick_nb(N, bytes_per_image=1024, acc_bytes_per_image=1024)
    assert nb == 4  # the budget comfortably fits all four images
    x = jnp.asarray(rng.random((T, N, H, W, cin)) < 0.3, jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.2, jnp.float32)
    a = jnp.ones((cout,), jnp.float32)
    b = jnp.zeros((cout,), jnp.float32)
    v0 = jnp.zeros((N, H, W, cout), jnp.float32)
    i0 = jnp.zeros((N, H, W, cout), jnp.float32)
    zf, vf, if_ = spiking_conv_seq(x, w, a, b, v0, i0, interpret=True)
    zr, vr, ir = _unfused_reference(x, w, a, b, v0, i0, "lif", 1)
    np.testing.assert_allclose(np.asarray(zf), np.asarray(zr),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vf), np.asarray(vr),
                               rtol=1e-4, atol=1e-5)


# Temporal LIF/LI kernel: whole-T loop with VMEM-resident state and a
# truncation gate (the traced random-start BPTT window)


def test_temporal_cell_seq_truncation_matches_masked_scan(rng):
    """temporal_cell_seq(start=r): state frozen for t < r, outputs
    emitted from the frozen state — bit-identical to the masked scan,
    forward AND backward (custom VJP recomputes through the scan with
    the same gate), including a traced r under jit."""
    from snn_for_object_detection_tpu.ops import pallas_kernels as pk

    T, m, c = 8, 16, 8
    x = jnp.asarray(rng.normal(size=(T, m, c)) * 2, jnp.float32)
    v0 = jnp.zeros((m, c))
    i0 = jnp.zeros((m, c))
    for cell in ("lif", "li"):
        for r in (0, 3, 7):
            z1, v1, i1 = jax.jit(
                lambda x, r, cell=cell: pk.temporal_cell_seq(
                    x, v0, i0, cell=cell, start=r
                )
            )(x, jnp.int32(r))
            z2, v2, i2 = pk._temporal_scan_reference(x, v0, i0, r, cell)
            np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))
            np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
            np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))

            g1 = jax.grad(
                lambda x: pk.temporal_cell_seq(
                    x, v0, i0, cell=cell, start=r
                )[0].sum()
            )(x)
            g2 = jax.grad(
                lambda x: pk._temporal_scan_reference(
                    x, v0, i0, r, cell
                )[0].sum()
            )(x)
            np.testing.assert_allclose(
                np.asarray(g1), np.asarray(g2), rtol=1e-6
            )


def test_temporal_cell_seq_partitions_without_gather(rng):
    """Under a sharded 2-D (data x space) mesh the temporal kernel must
    run shard-local (custom_partitioning rule): identical numerics to
    the scan reference, sharded output, and NO all-gather of the
    [T, B, H, W, C] sequence in the compiled module."""
    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 virtual devices")
    from jax.sharding import NamedSharding, PartitionSpec as P

    from snn_for_object_detection_tpu.ops import pallas_kernels as pk
    from snn_for_object_detection_tpu.parallel import make_mesh

    mesh = make_mesh(jax.devices()[:8], spatial=2)
    T, B, H, W, C = 8, 4, 16, 8, 8
    x = jnp.asarray(rng.normal(size=(T, B, H, W, C)) * 2, jnp.float32)
    v0 = jnp.zeros((B, H, W, C))
    i0 = jnp.zeros((B, H, W, C))
    x_sh = NamedSharding(mesh, P(None, "data", "space"))
    st_sh = NamedSharding(mesh, P("data", "space"))
    f = jax.jit(
        lambda x, v, i, r: pk.temporal_cell_seq(
            x, v, i, cell="lif", start=r
        ),
        in_shardings=(x_sh, st_sh, st_sh, None),
    )
    xd = jax.device_put(x, x_sh)
    vd = jax.device_put(v0, st_sh)
    id_ = jax.device_put(i0, st_sh)
    z, vT, iT = f(xd, vd, id_, jnp.int32(3))
    z2, v2, i2 = pk._temporal_scan_reference(x, v0, i0, 3, "lif")
    np.testing.assert_array_equal(np.asarray(z), np.asarray(z2))
    np.testing.assert_array_equal(np.asarray(vT), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(iT), np.asarray(i2))
    assert z.sharding.spec == P(None, "data", "space")
    hlo = f.lower(xd, vd, id_, jnp.int32(3)).compile().as_text()
    assert "all-gather" not in hlo, "sequence was gathered off-shard"
