"""Functional spiking/analog neuron cells with surrogate gradients.

All cells are pure functions ``step(x, state, params) -> (out, new_state)``
operating on arbitrary-shaped arrays. They reproduce the dynamics the
reference gets from norse 1.1.0 (LIF / LI, see the behavioral spec in
SURVEY.md §2.5) plus the reference's first-party cells:

- SLI  (saturable leaky integrator):  /root/reference/models/modules/sli.py:110-126
- Synapse (mediator transmission):    /root/reference/models/modules/synapse.py:73-103

Euler integration with ``dt = 0.001`` throughout, matching
``/root/reference/models/modules/sli.py:115``.

The spike nonlinearity uses the SuperSpike surrogate gradient
(fast-sigmoid derivative, alpha=100) as a ``jax.custom_vjp``: forward is
a hard Heaviside ``x > 0``; backward is ``g / (alpha*|x| + 1)^2``.

TPU notes: every step is a handful of fused element-wise VPU ops; XLA
fuses the whole update into the surrounding scan body, so no Pallas is
needed for the cell math itself (the conv feeding it dominates).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


# ---------------------------------------------------------------------------
# Surrogate gradient
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def superspike(x: Array, alpha: float = 100.0) -> Array:
    """Heaviside spike with SuperSpike surrogate gradient.

    Forward: ``(x > 0)`` (strict, matching norse's ``torch.gt``).
    Backward: ``grad / (alpha * |x| + 1)**2``.
    """
    return (x > 0).astype(x.dtype)


def _superspike_fwd(x, alpha):
    return (x > 0).astype(x.dtype), x


def _superspike_bwd(alpha, x, g):
    return (g / (alpha * jnp.abs(x) + 1.0) ** 2,)


superspike.defvjp(_superspike_fwd, _superspike_bwd)


# ---------------------------------------------------------------------------
# LIF — leaky integrate-and-fire (norse LIFCell semantics)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class LIFParams:
    """Static LIF parameters (norse defaults; SURVEY.md §2.5)."""

    tau_syn_inv: float = 1.0 / 5e-3
    tau_mem_inv: float = 1.0 / 1e-2
    v_leak: float = 0.0
    v_th: float = 1.0
    v_reset: float = 0.0
    alpha: float = 100.0
    dt: float = 1e-3


class LIFState(NamedTuple):
    v: Array
    i: Array


def lif_init(shape, dtype=jnp.float32, p: LIFParams = LIFParams()) -> LIFState:
    return LIFState(
        v=jnp.full(shape, p.v_leak, dtype=dtype), i=jnp.zeros(shape, dtype=dtype)
    )


def lif_step(
    x: Array, state: LIFState, p: LIFParams = LIFParams()
) -> Tuple[Array, LIFState]:
    """One Euler step of a feed-forward LIF neuron.

    Order of operations matches norse ``lif_feed_forward_step``:
    decay (v, i) -> spike from decayed v -> reset (stop-gradient through
    the reset gate) -> inject input into current.
    """
    dv = p.dt * p.tau_mem_inv * ((p.v_leak - state.v) + state.i)
    v_decayed = state.v + dv
    i_decayed = state.i - p.dt * p.tau_syn_inv * state.i
    z = superspike(v_decayed - p.v_th, p.alpha)
    z_sg = jax.lax.stop_gradient(z)
    v_new = (1.0 - z_sg) * v_decayed + z_sg * p.v_reset
    i_new = i_decayed + x
    return z, LIFState(v_new, i_new)


# ---------------------------------------------------------------------------
# LI — non-spiking leaky integrator (norse LICell semantics)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class LIParams:
    tau_syn_inv: float = 1.0 / 5e-3
    tau_mem_inv: float = 1.0 / 1e-2
    v_leak: float = 0.0
    dt: float = 1e-3


class LIState(NamedTuple):
    v: Array
    i: Array


def li_init(shape, dtype=jnp.float32, p: LIParams = LIParams()) -> LIState:
    return LIState(
        v=jnp.full(shape, p.v_leak, dtype=dtype), i=jnp.zeros(shape, dtype=dtype)
    )


def li_step(
    x: Array, state: LIState, p: LIParams = LIParams()
) -> Tuple[Array, LIState]:
    """One Euler step of a leaky integrator; output is membrane voltage.

    Matches norse ``li_feed_forward_step``: the input current jump is
    applied *before* the voltage update (unlike LIF).
    """
    i_jump = state.i + x
    dv = p.dt * p.tau_mem_inv * ((p.v_leak - state.v) + i_jump)
    v_new = state.v + dv
    i_decayed = i_jump - p.dt * p.tau_syn_inv * i_jump
    return v_new, LIState(v_new, i_decayed)


# ---------------------------------------------------------------------------
# PLIF — parametric LIF with learnable per-channel time constants
# (beyond-reference model family; BASELINE.json config 4. The membrane
# and synaptic decay rates become trainable parameters, gradients
# flowing through the Euler update.)
# ---------------------------------------------------------------------------


class PLIFParams(NamedTuple):
    """Trainable per-channel inverse time constants (positive via
    softplus at apply time)."""

    raw_tau_syn: Array  # softplus(raw) = tau_syn_inv
    raw_tau_mem: Array


def plif_params_init(
    channels: int,
    tau_syn_inv: float = 1.0 / 5e-3,
    tau_mem_inv: float = 1.0 / 1e-2,
) -> PLIFParams:
    """Initialize raw params so softplus(raw) equals the LIF defaults."""
    import math

    def inv_softplus(y):
        return math.log(math.expm1(y))

    return PLIFParams(
        raw_tau_syn=jnp.full((channels,), inv_softplus(tau_syn_inv)),
        raw_tau_mem=jnp.full((channels,), inv_softplus(tau_mem_inv)),
    )


def plif_step(
    x: Array,
    state: LIFState,
    learn: PLIFParams,
    p: LIFParams = LIFParams(),
) -> Tuple[Array, LIFState]:
    """LIF dynamics with learnable per-channel decay rates (channels =
    trailing axis, NHWC)."""
    tau_syn_inv = jax.nn.softplus(learn.raw_tau_syn)
    tau_mem_inv = jax.nn.softplus(learn.raw_tau_mem)
    dv = p.dt * tau_mem_inv * ((p.v_leak - state.v) + state.i)
    v_decayed = state.v + dv
    i_decayed = state.i - p.dt * tau_syn_inv * state.i
    z = superspike(v_decayed - p.v_th, p.alpha)
    z_sg = jax.lax.stop_gradient(z)
    v_new = (1.0 - z_sg) * v_decayed + z_sg * p.v_reset
    i_new = i_decayed + x
    return z, LIFState(v_new, i_new)


# ---------------------------------------------------------------------------
# ALIF — adaptive-threshold LIF
# (beyond-reference: spike-triggered threshold adaptation with its own
# decay; standard adaptive LIF formulation.)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ALIFParams:
    tau_syn_inv: float = 1.0 / 5e-3
    tau_mem_inv: float = 1.0 / 1e-2
    tau_adapt_inv: float = 1.0 / 1e-1
    beta: float = 0.2  # threshold jump per spike
    v_leak: float = 0.0
    v_th: float = 1.0
    v_reset: float = 0.0
    alpha: float = 100.0
    dt: float = 1e-3


class ALIFState(NamedTuple):
    v: Array
    i: Array
    b: Array  # adaptive threshold offset


def alif_init(shape, dtype=jnp.float32, p: ALIFParams = ALIFParams()) -> ALIFState:
    return ALIFState(
        v=jnp.full(shape, p.v_leak, dtype=dtype),
        i=jnp.zeros(shape, dtype=dtype),
        b=jnp.zeros(shape, dtype=dtype),
    )


def alif_step(
    x: Array, state: ALIFState, p: ALIFParams = ALIFParams()
) -> Tuple[Array, ALIFState]:
    dv = p.dt * p.tau_mem_inv * ((p.v_leak - state.v) + state.i)
    v_decayed = state.v + dv
    i_decayed = state.i - p.dt * p.tau_syn_inv * state.i
    b_decayed = state.b - p.dt * p.tau_adapt_inv * state.b
    z = superspike(v_decayed - (p.v_th + b_decayed), p.alpha)
    z_sg = jax.lax.stop_gradient(z)
    v_new = (1.0 - z_sg) * v_decayed + z_sg * p.v_reset
    b_new = b_decayed + p.beta * z_sg
    i_new = i_decayed + x
    return z, ALIFState(v_new, i_new, b_new)


# ---------------------------------------------------------------------------
# SLI — saturable leaky integrator
# (reference first-party cell: /root/reference/models/modules/sli.py:110-126)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SLIParams:
    tau_syn_inv: float = 1.0 / 5e-3
    tau_mem_inv: float = 1.0 / 1e-2
    v_leak: float = 0.0
    v_st: float = 1.0
    dt: float = 1e-3


class SLIState(NamedTuple):
    v: Array
    i: Array


def sli_init(shape, dtype=jnp.float32, p: SLIParams = SLIParams()) -> SLIState:
    return SLIState(
        v=jnp.full(shape, p.v_leak, dtype=dtype), i=jnp.zeros(shape, dtype=dtype)
    )


def sli_step(
    x: Array, state: SLIState, p: SLIParams = SLIParams()
) -> Tuple[Array, SLIState]:
    """Saturable LI: input current is gated by ``sigmoid(v_st - |v|)`` so
    the membrane saturates at ±v_st (sli.py:117-126)."""
    i_jump = state.i + x * jax.nn.sigmoid(p.v_st - jnp.abs(state.v))
    dv = p.dt * p.tau_mem_inv * ((p.v_leak - state.v) + i_jump)
    v_new = state.v + dv
    i_decayed = i_jump - p.dt * p.tau_syn_inv * i_jump
    return v_new, SLIState(v_new, i_decayed)


# ---------------------------------------------------------------------------
# Synapse — mediator-concentration synaptic transmission
# (reference first-party cell: /root/reference/models/modules/synapse.py:73-103)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SynapseParams:
    tau_med_secretion: float = 1.0 / 1e-3
    tau_med_dissociation: float = 1.0 / 5e-3
    sigma_inhibition: float = 0.0
    dt: float = 1e-3

    def __post_init__(self):
        if self.sigma_inhibition != 0 and self.sigma_inhibition < 0.5:
            raise ValueError(
                "Valid values for sigma_inhibition are 0 or >= 0.5, got "
                f"{self.sigma_inhibition}"
            )


class SynapseState(NamedTuple):
    p: Array


def synapse_init(
    shape, dtype=jnp.float32, p: SynapseParams = SynapseParams()
) -> SynapseState:
    return SynapseState(p=jnp.zeros(shape, dtype=dtype))


def synapse_step(
    x: Array, state: SynapseState, p: SynapseParams = SynapseParams()
) -> Tuple[Array, SynapseState]:
    """Mediator concentration relaxes toward the input with asymmetric
    time constants (secretion when input > 0, dissociation otherwise);
    optional parabolic inhibition when ``sigma_inhibition >= 0.5``."""
    tau = jnp.where(x > 0, p.tau_med_secretion, p.tau_med_dissociation)
    p_new = state.p + (x - state.p) * tau * p.dt
    if p.sigma_inhibition != 0:
        g = 4.0 * p.sigma_inhibition * (p_new - p.sigma_inhibition * jnp.square(p_new))
    else:
        g = p_new
    g = jnp.maximum(g, 0.0)
    return g, SynapseState(p_new)
