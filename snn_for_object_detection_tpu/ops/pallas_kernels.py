"""Pallas TPU kernels: fused pointwise-conv + BN + LIF.

The north-star design (BASELINE.json) calls for the per-step
conv -> BN -> LIF membrane update as a fused kernel keeping (v, i) in
VMEM for the duration of the step. A 1x1 convolution is a channel
matmul, so the fused op is:

    y = x @ w            (MXU, fp32 accumulate)
    y = y * a + b        (folded eval-mode BN)
    z, (v', i') = LIF(y, (v, i))   (VPU, fp32 math)

in ONE pass over the [N, C] = [B*H*W, C] tensors: x, v, i are read
once, z, v', i' written once, and the conv/BN intermediates never
touch HBM. This targets the measured bottleneck: LIF state traffic
costs ~2x the convolutions themselves (see docs/perf.md).

MEASURED OUTCOME (v5e, chained device timing, docs/perf.md): XLA's own
fusion of matmul + BN + LIF epilogue matches or beats this kernel
(XLA 0.6-0.73 ms vs Pallas 0.6-1.5 ms across C2f shapes) — GSPMD/Mosaic
already emit a single fused pass for the elementwise chain. Per the
build plan (SURVEY.md §7.1.4) the production path therefore stays on
plain XLA conv + fused elementwise; this kernel is kept as a verified,
benchmarked alternative (`benchmarks/bench_pallas.py`) and a template
for future conv-fused variants.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# LIF constants (norse defaults, SURVEY.md §2.5)
_DT = 1e-3
_TAU_SYN_INV = 200.0
_TAU_MEM_INV = 100.0
_V_TH = 1.0


def _fused_kernel(x_ref, w_ref, a_ref, b_ref, v_ref, i_ref,
                  z_ref, v_out_ref, i_out_ref):
    # matmul on the MXU with fp32 accumulation
    y = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    y = y * a_ref[:] + b_ref[:]
    v = v_ref[:].astype(jnp.float32)
    i = i_ref[:].astype(jnp.float32)
    # norse lif_feed_forward_step order: decay -> spike -> reset -> inject
    v_dec = v + _DT * _TAU_MEM_INV * (i - v)
    i_dec = i - _DT * _TAU_SYN_INV * i
    z = (v_dec > _V_TH).astype(jnp.float32)
    v_new = (1.0 - z) * v_dec
    i_new = i_dec + y
    z_ref[:] = z.astype(z_ref.dtype)
    v_out_ref[:] = v_new.astype(v_out_ref.dtype)
    i_out_ref[:] = i_new.astype(i_out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def fused_pointwise_conv_bn_lif(
    x: jax.Array,      # [N, Cin]
    w: jax.Array,      # [Cin, Cout]
    a: jax.Array,      # [Cout] folded BN scale  = gamma * rsqrt(var+eps)
    b: jax.Array,      # [Cout] folded BN offset = -mean * a (+ beta)
    v: jax.Array,      # [N, Cout] membrane
    i: jax.Array,      # [N, Cout] synaptic current
    block_n: int = 512,
    interpret: bool = False,
):
    """One fused pass: returns (z, v_new, i_new), all [N, Cout]."""
    n, cin = x.shape
    cout = w.shape[1]
    grid = (pl.cdiv(n, block_n),)
    out_shape = [
        jax.ShapeDtypeStruct((n, cout), x.dtype),
        jax.ShapeDtypeStruct((n, cout), v.dtype),
        jax.ShapeDtypeStruct((n, cout), i.dtype),
    ]
    row_spec = pl.BlockSpec((block_n, cin), lambda g: (g, 0),
                            memory_space=pltpu.VMEM)
    state_spec = pl.BlockSpec((block_n, cout), lambda g: (g, 0),
                              memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda g: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _fused_kernel,
        grid=grid,
        in_specs=[
            row_spec,
            full((cin, cout)),
            full((cout,)),
            full((cout,)),
            state_spec,
            state_spec,
        ],
        out_specs=[state_spec, state_spec, state_spec],
        out_shape=out_shape,
        interpret=interpret,
    )(x, w, a, b, v, i)


def xla_pointwise_conv_bn_lif(x, w, a, b, v, i):
    """Reference XLA implementation of the same fused op (used for
    correctness checks and as the honest baseline in benchmarks)."""
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    y = y * a + b
    vf = v.astype(jnp.float32)
    if_ = i.astype(jnp.float32)
    v_dec = vf + _DT * _TAU_MEM_INV * (if_ - vf)
    i_dec = if_ - _DT * _TAU_SYN_INV * if_
    z = (v_dec > _V_TH).astype(jnp.float32)
    v_new = (1.0 - z) * v_dec
    i_new = i_dec + y
    return z.astype(x.dtype), v_new.astype(v.dtype), i_new.astype(i.dtype)
