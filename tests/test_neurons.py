"""Unit tests for neuron cells vs. closed-form numpy Euler steps.

Oracles re-derive the dynamics specified in SURVEY.md §2.5 and the
reference's first-party cells (sli.py:110-126, synapse.py:73-103).
"""

import jax
import jax.numpy as jnp
import numpy as np

from snn_for_object_detection_tpu.ops import neurons


DT = 1e-3


def np_lif_step(x, v, i, tau_syn_inv=200.0, tau_mem_inv=100.0, v_leak=0.0,
                v_th=1.0, v_reset=0.0):
    dv = DT * tau_mem_inv * ((v_leak - v) + i)
    v_dec = v + dv
    i_dec = i - DT * tau_syn_inv * i
    z = (v_dec - v_th > 0).astype(np.float32)
    v_new = (1 - z) * v_dec + z * v_reset
    i_new = i_dec + x
    return z, v_new, i_new


def test_lif_matches_numpy_over_time(rng):
    shape = (3, 5)
    state = neurons.lif_init(shape)
    v, i = np.zeros(shape, np.float32), np.zeros(shape, np.float32)
    for _ in range(50):
        x = rng.uniform(0, 3, shape).astype(np.float32)
        z, state = neurons.lif_step(jnp.asarray(x), state)
        z_ref, v, i = np_lif_step(x, v, i)
        np.testing.assert_allclose(np.asarray(z), z_ref, atol=1e-6)
        np.testing.assert_allclose(np.asarray(state.v), v, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(state.i), i, rtol=1e-5, atol=1e-6)


def test_lif_spikes_and_resets():
    # Large constant input drives the membrane over threshold; after a
    # spike the membrane must reset to v_reset = 0.
    state = neurons.lif_init(())
    spiked = False
    for _ in range(200):
        z, state = neurons.lif_step(jnp.asarray(5.0), state)
        if float(z) == 1.0:
            spiked = True
            assert float(state.v) == 0.0
            break
    assert spiked


def test_superspike_gradient():
    grad = jax.grad(lambda x: neurons.superspike(x, 100.0))
    # Surrogate: 1 / (alpha*|x| + 1)^2
    for x in [-0.5, -0.01, 0.0, 0.01, 0.5]:
        expected = 1.0 / (100.0 * abs(x) + 1.0) ** 2
        np.testing.assert_allclose(float(grad(jnp.asarray(x))), expected, rtol=1e-6)


def test_lif_bptt_gradient_flows():
    # Gradient through a 10-step LIF scan must be finite and nonzero.
    def loss(w):
        state = neurons.lif_init((4,))
        out = 0.0
        for _ in range(10):
            z, state = neurons.lif_step(w * jnp.ones(4), state)
            out = out + z.sum()
        return out

    g = jax.grad(loss)(jnp.asarray(1.5))
    assert np.isfinite(float(g))
    assert float(g) != 0.0


def test_li_matches_numpy(rng):
    shape = (2, 3)
    state = neurons.li_init(shape)
    v, i = np.zeros(shape, np.float32), np.zeros(shape, np.float32)
    for _ in range(50):
        x = rng.normal(size=shape).astype(np.float32)
        out, state = neurons.li_step(jnp.asarray(x), state)
        # LI: current jump BEFORE voltage update
        i_jump = i + x
        dv = DT * 100.0 * ((0.0 - v) + i_jump)
        v = v + dv
        i = i_jump - DT * 200.0 * i_jump
        np.testing.assert_allclose(np.asarray(out), v, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(state.i), i, rtol=1e-5, atol=1e-6)


def test_sli_matches_reference_math(rng):
    shape = (4,)
    state = neurons.sli_init(shape)
    v = np.zeros(shape, np.float32)
    i = np.zeros(shape, np.float32)
    for _ in range(50):
        x = rng.normal(size=shape).astype(np.float32) * 2
        out, state = neurons.sli_step(jnp.asarray(x), state)
        # sli.py:117-126
        sig = 1 / (1 + np.exp(-(1.0 - np.abs(v))))
        i_jump = i + x * sig
        dv = DT * 100.0 * ((0.0 - v) + i_jump)
        v = v + dv
        i = i_jump - DT * 200.0 * i_jump
        np.testing.assert_allclose(np.asarray(out), v, rtol=1e-4, atol=1e-5)


def test_sli_saturates():
    # With huge constant input the sigmoid gate closes and the membrane
    # stays far below the plain-LI equilibrium (x / (dt * tau_syn_inv)
    # = 500 for x = 100).
    state = neurons.sli_init(())
    for _ in range(3000):
        out, state = neurons.sli_step(jnp.asarray(100.0), state)
    assert float(state.v) < 20.0

    li_state = neurons.li_init(())
    for _ in range(3000):
        li_out, li_state = neurons.li_step(jnp.asarray(100.0), li_state)
    assert float(state.v) < 0.1 * float(li_state.v)


def test_synapse_matches_reference_math(rng):
    shape = (4,)
    state = neurons.synapse_init(shape)
    p = np.zeros(shape, np.float32)
    for _ in range(30):
        x = rng.normal(size=shape).astype(np.float32)
        out, state = neurons.synapse_step(jnp.asarray(x), state)
        tau = np.where(x > 0, 1000.0, 200.0)
        p = p + (x - p) * tau * DT
        g = np.clip(p, 0.0, None)
        np.testing.assert_allclose(np.asarray(out), g, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(state.p), p, rtol=1e-5, atol=1e-6)


def test_synapse_inhibition():
    params = neurons.SynapseParams(sigma_inhibition=0.5)
    state = neurons.synapse_init((1,))
    x = jnp.asarray([0.8])
    out, new_state = neurons.synapse_step(x, state, params)
    p_new = 0.0 + (0.8 - 0.0) * 1000.0 * DT  # = 0.8
    g = 4 * 0.5 * (p_new - 0.5 * p_new**2)
    np.testing.assert_allclose(float(out[0]), max(g, 0.0), rtol=1e-5)


def test_synapse_invalid_sigma_raises():
    import pytest

    with pytest.raises(ValueError):
        neurons.SynapseParams(sigma_inhibition=0.3)
