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
