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
import numpy as np
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


# ---------------------------------------------------------------------------
# Temporal-fusion kernel: a whole LIF/LI layer's time loop in ONE pass
# ---------------------------------------------------------------------------
#
# In time-batched execution (CompiledBlock.apply_seq) the convolutions
# run folded over T*B (fast), but a per-layer `lax.scan` for the cell
# costs 32 separate elementwise kernels, each reading and writing the
# (v, i) state from HBM: ~3x more state traffic than the math needs.
# This kernel runs the T-step time loop INSIDE the grid: t is the
# innermost grid dimension, (v, i) live in VMEM scratch across t, and
# HBM sees exactly one read of x[t] and one write of z[t] per step —
# the state never touches HBM between t=0 and t=T-1.
#
# Numerics mirror ops/neurons.lif_step / li_step exactly, including the
# per-step quantization of stored state to `state_dtype` (scratch is
# kept in the storage dtype and upcast to fp32 for the update math), so
# forward_seq(pallas) == forward(step scan) bit-for-bit.

_V_LEAK = 0.0


def _temporal_kernel(cell, block_t):
    def kernel(r_ref, x_ref, v0_ref, i0_ref, z_ref, vT_ref, iT_ref,
               v_s, i_s):
        t = pl.program_id(1)
        r = r_ref[0, 0]  # truncation start: state frozen for t < r

        @pl.when(t == 0)
        def _():
            v_s[:] = v0_ref[:]
            i_s[:] = i0_ref[:]

        # static inner loop over block_t steps: one grid step amortizes
        # its DMA/launch overhead over block_t state updates. (v, i)
        # stay in vector registers across the loop — scratch is touched
        # once per grid step, not once per time step (measured 2.5x).
        v = v_s[:].astype(jnp.float32)
        i = i_s[:].astype(jnp.float32)
        for k in range(block_t):
            x = x_ref[k].astype(jnp.float32)
            if cell == "lif":
                # decay -> spike -> reset -> inject (neurons.lif_step)
                v_dec = v + _DT * _TAU_MEM_INV * ((_V_LEAK - v) + i)
                i_dec = i - _DT * _TAU_SYN_INV * i
                spike = v_dec - _V_TH > 0
                v_new = jnp.where(spike, 0.0, v_dec)
                i_new = i_dec + x
                out = spike
            else:  # "li": current jump BEFORE the voltage update (li_step)
                i_jump = i + x
                v_new = v + _DT * _TAU_MEM_INV * ((_V_LEAK - v) + i_jump)
                i_new = i_jump - _DT * _TAU_SYN_INV * i_jump
                out = v_new
            # mirror the scan path's per-step state quantization
            v_new = v_new.astype(v_s.dtype).astype(jnp.float32)
            i_new = i_new.astype(i_s.dtype).astype(jnp.float32)
            # truncation gate: output is the candidate either way (the
            # masked scan also emits the cell output computed from the
            # frozen state), but the state only commits once t >= r.
            active = t * block_t + k >= r
            v = jnp.where(active, v_new, v)
            i = jnp.where(active, i_new, i)
            z_ref[k] = out.astype(z_ref.dtype)
        v_s[:] = v.astype(v_s.dtype)
        i_s[:] = i.astype(i_s.dtype)

        @pl.when(t == pl.num_programs(1) - 1)
        def _():
            vT_ref[:] = v_s[:]
            iT_ref[:] = i_s[:]

    return kernel


def _temporal_pallas_core(x_seq, v0, i0, r_arr, cell, block_t, interpret):
    """The pallas_call on (the local shard of) the sequence."""
    T = x_seq.shape[0]
    step_shape = x_seq.shape[1:]
    c = step_shape[-1]
    m = 1
    for d in step_shape[:-1]:
        m *= d
    # Merge only LEADING dims: (T, B, H, W, C) -> (T, B*H*W, C) keeps
    # the minor (lane) dimension intact, so the reshape is free — no
    # physical tile repack (flattening into lanes of 128 forced a
    # relayout of every C<128 tensor: measured ~100 ms/forward).
    x2 = x_seq.reshape(T, m, c)
    v2 = v0.reshape(m, c)
    i2 = i0.reshape(m, c)
    bt = block_t
    while T % bt:  # T must split evenly into time blocks
        bt //= 2
    # rows per block from a ~1 MB VMEM budget per buffer; VMEM tiles pad
    # the lane (channel) dim to 128, so budget with the padded width
    c_pad = -(-c // 128) * 128
    r = max(8, min(m, (1 << 20) // (bt * c_pad * x_seq.dtype.itemsize)))
    r = max(8, (r // 8) * 8)
    grid = (pl.cdiv(m, r), T // bt)  # t innermost: state stays in VMEM
    seq_spec = pl.BlockSpec((bt, r, c), lambda n, t: (t, n, 0),
                            memory_space=pltpu.VMEM)
    state_spec = pl.BlockSpec((r, c), lambda n, t: (n, 0),
                              memory_space=pltpu.VMEM)
    z2, vT, iT = pl.pallas_call(
        _temporal_kernel(cell, bt),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            seq_spec, state_spec, state_spec,
        ],
        out_specs=[seq_spec, state_spec, state_spec],
        out_shape=[
            jax.ShapeDtypeStruct((T, m, c), x_seq.dtype),
            jax.ShapeDtypeStruct((m, c), v0.dtype),
            jax.ShapeDtypeStruct((m, c), i0.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((r, c), v0.dtype),
            pltpu.VMEM((r, c), i0.dtype),
        ],
        interpret=interpret,
    )(r_arr, x2, v2, i2)
    return (
        z2.reshape(x_seq.shape),
        vT.reshape(step_shape),
        iT.reshape(step_shape),
    )


@functools.lru_cache(maxsize=None)
def _partitioned_temporal(cell, block_t, interpret, ndim):
    """GSPMD-partitionable wrapper around the temporal kernel.

    A Mosaic custom call has no built-in partitioning rule, so under a
    sharded mesh GSPMD would otherwise all-gather the full [T, B, H,
    W, C] sequence onto every device. The cell is elementwise over
    every non-time axis, so the correct partitioning is trivial: each
    device runs the kernel on its local rows. Declared via
    custom_partitioning with an einsum-style rule (shardy) +
    operand-sharding inference (GSPMD fallback); the time axis and the
    (1, 1) truncation scalar stay replicated."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    @custom_partitioning
    def fwd(x_seq, v0, i0, r_arr):
        return _temporal_pallas_core(
            x_seq, v0, i0, r_arr, cell, block_t, interpret
        )

    def _x_specs(mesh, arg_shapes):
        x_sh = arg_shapes[0].sharding
        spec = (
            tuple(x_sh.spec) if isinstance(x_sh, NamedSharding) else ()
        )
        spec += (None,) * (ndim - len(spec))
        step = P(*spec[1:])
        return (
            NamedSharding(mesh, P(None, *spec[1:])),  # z (t replicated)
            NamedSharding(mesh, step),                # vT / iT
        )

    def infer_sharding_from_operands(mesh, arg_shapes, result_shape):
        z_sh, st_sh = _x_specs(mesh, arg_shapes)
        return (z_sh, st_sh, st_sh)

    def partition(mesh, arg_shapes, result_shape):
        z_sh, st_sh = _x_specs(mesh, arg_shapes)
        rep2 = NamedSharding(mesh, P(None, None))

        def lower(x_seq, v0, i0, r_arr):
            return _temporal_pallas_core(
                x_seq, v0, i0, r_arr, cell, block_t, interpret
            )

        return (
            mesh,
            lower,
            (z_sh, st_sh, st_sh),
            (z_sh, st_sh, st_sh, rep2),
        )

    # einsum-like factor rule: every non-time axis of the sequence is
    # shared with the states and outputs (shardable); t and the scalar
    # are their own factors.
    dims = " ".join(f"d{k}" for k in range(ndim - 1))
    rule = (
        f"t {dims}, {dims}, {dims}, p q -> t {dims}, {dims}, {dims}"
    )
    fwd.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer_sharding_from_operands,
        sharding_rule=rule,
    )
    return fwd


@functools.partial(
    jax.jit, static_argnames=("cell", "block_t", "interpret")
)
def _temporal_cell_seq_fwd_impl(x_seq, v0, i0, start, cell, block_t,
                                interpret):
    r_arr = jnp.asarray(start, jnp.int32).reshape(1, 1)
    return _partitioned_temporal(cell, block_t, interpret, x_seq.ndim)(
        x_seq, v0, i0, r_arr
    )


def _temporal_scan_reference(x_seq, v0, i0, start, cell):
    """lax.scan implementation with identical numerics (fp32 math,
    state_dtype storage, ``start``-gated truncation); used for the
    backward pass — its VJP carries the SuperSpike surrogate gradient
    from ops/neurons."""
    from snn_for_object_detection_tpu.ops import neurons

    state_dtype = v0.dtype
    if cell == "lif":
        step, state_t = neurons.lif_step, neurons.LIFState
    else:
        step, state_t = neurons.li_step, neurons.LIState

    T = x_seq.shape[0]
    keep = jnp.arange(T) >= start

    def body(st, inp):
        x_t, k_t = inp
        st32 = jax.tree.map(lambda a: a.astype(jnp.float32), st)
        out, new = step(x_t.astype(jnp.float32), st32)
        new = jax.tree.map(lambda a: a.astype(state_dtype), new)
        # truncation gate mirroring compile._masked_state: the output
        # is emitted either way; the state only commits once t >= start
        new = jax.tree.map(lambda n, o: jnp.where(k_t, n, o), new, st)
        return new, out.astype(x_t.dtype)

    state, z = jax.lax.scan(body, state_t(v0, i0), (x_seq, keep))
    return z, state.v, state.i


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _temporal_cell_seq(x_seq, v0, i0, start, cell, block_t, interpret):
    return _temporal_cell_seq_fwd_impl(
        x_seq, v0, i0, start, cell, block_t, interpret
    )


def _temporal_fwd(x_seq, v0, i0, start, cell, block_t, interpret):
    out = _temporal_cell_seq_fwd_impl(
        x_seq, v0, i0, start, cell, block_t, interpret
    )
    return out, (x_seq, v0, i0, start)


def _temporal_bwd(cell, block_t, interpret, res, cts):
    # Backward recomputes via the scan reference (same numerics); BPTT
    # memory matches the plain scan path.
    x_seq, v0, i0, start = res
    _, vjp = jax.vjp(
        lambda x, v, i: _temporal_scan_reference(x, v, i, start, cell),
        x_seq, v0, i0,
    )
    # `start` is an int32 scalar: its cotangent is the float0 zero
    ct_start = np.zeros(np.shape(start), dtype=jax.dtypes.float0)
    return (*vjp(cts), ct_start)


_temporal_cell_seq.defvjp(_temporal_fwd, _temporal_bwd)


def temporal_cell_seq(
    x_seq: jax.Array,  # [T, ...] per-step cell input
    v0: jax.Array,     # [...] initial membrane (state storage dtype)
    i0: jax.Array,     # [...] initial current
    cell: str = "lif",
    block_t: int = 8,
    interpret: bool | None = None,
    start: jax.Array | int = 0,
):
    """Whole-layer temporal LIF/LI: ``(z_seq, v_T, i_T)`` in one HBM
    pass, state resident in VMEM across the T loop.

    Requires the per-step row count (product of all but the channel
    axis) to be a multiple of 8 (the caller falls back to the scan path
    otherwise). Differentiable: the
    backward pass recomputes through the scan reference, preserving the
    SuperSpike surrogate gradient.

    :param start: Traced truncation scalar r — the state is frozen for
        steps t < r (outputs still emitted from the frozen state),
        matching the masked scan path of the detector's random-start
        BPTT truncation (soda.py:149 analogue). 0 = no truncation.
    """
    if cell not in ("lif", "li"):
        raise ValueError(f"unsupported cell {cell!r}")
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    start = jnp.asarray(start, jnp.int32)
    return _temporal_cell_seq(x_seq, v0, i0, start, cell, block_t,
                              interpret)


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


# ---------------------------------------------------------------------------
# Fused temporal spiking-conv kernel: kxk conv (k in {1, 3}, stride in
# {1, 2}) + BN affine + LIF/LI, whole time loop inside, neuron state
# resident in VMEM
# ---------------------------------------------------------------------------
#
# The profiled seq-path cost of one spiking conv unit is dominated by
# glue, not math: the conv fusion emits a batch-minor layout, the BN
# affine is a separate full-tensor pass, the temporal cell kernel needs
# channel-minor input, and XLA inserts full relayout copies at each
# boundary (~60% of forward_seq wall time is copies/affines/reshapes).
# This kernel replaces the whole [Conv kxk -> BN(eval) -> LIF/LI]
# unit for a [T, N, H, W, C] sequence with ONE pass:
#
#   grid (N/nb, H_out/rh, T), t innermost; per (n-block, h-block):
#     t=0: load the (v, i) block into VMEM scratch
#     each t: DMA the (nb, (rh-1)*s+k, W_in_pad, Cin) input slab,
#             accumulate k*k tap matmuls
#               acc += shifted_window @ W[tap]   (MXU, fp32 acc)
#             — NO im2col staging copy: the flattened-column scratch
#             of the previous design cost 24-42 MiB of scoped VMEM at
#             nb>1 (compile-time OOM, round-2 finding); per-tap
#             windows feed the MXU directly from the slab —
#             then round to the compute dtype, BN affine, cell update
#             in fp32 (VPU), write the spike/voltage block
#     t=T-1: flush (v, i) scratch to the outputs
#
# HBM traffic = read x_seq once + write z_seq once (+ states once);
# the conv/BN intermediates and the (v, i) time loop never leave VMEM.
# nb (images per grid step) is chosen to fill a VMEM budget — it
# amortizes the microsecond-scale grid-step sequencing overhead that
# kept the previous nb=1 kernel at parity with XLA.

def _spiking_conv_kernel(cell, nb, rh, w_out, cin, k, stride):
    def kernel(x_ref, w_ref, a_ref, b_ref, v0_ref, i0_ref,
               z_ref, vT_ref, iT_ref, v_s, i_s):
        t = pl.program_id(2)

        @pl.when(t == 0)
        def _():
            v_s[:] = v0_ref[:]
            i_s[:] = i0_ref[:]

        x_s = x_ref[0, :, 0]  # (nb, hs, ws, Cin) halo slabs
        a = a_ref[:]
        b = b_ref[:]
        acc = None
        for dy in range(k):
            for dx in range(k):
                if stride == 1:
                    patch = x_s[:, dy:dy + rh, dx:dx + w_out, :]
                else:
                    # Stride-2 slabs are phase-pre-split in HBM
                    # (strided slices lower to >2D gathers and
                    # sublane-splitting reshapes crash Mosaic at
                    # scale): the slab rows hold the four (row, col)
                    # decimation phases back to back, (rh+1) rows
                    # each, so tap (dy, dx) is a plain slice of
                    # phase (dy%2, dx%2) at offset (dy//2, dx//2).
                    p = (dy % 2) * 2 + (dx % 2)
                    r0 = p * (rh + 1) + dy // 2
                    patch = x_s[
                        :, r0:r0 + rh, dx // 2:dx // 2 + w_out, :
                    ]
                m = jnp.dot(
                    patch.reshape(nb * rh * w_out, cin),
                    w_ref[dy * k + dx],
                    preferred_element_type=jnp.float32,
                )
                acc = m if acc is None else acc + m
        y = acc.reshape(nb, rh, w_out, -1)
        # conv rounds to the compute dtype, then the eval-mode BN
        # affine runs in that dtype (matches the XLA path:
        # compile._bn_eval_affine)
        y = y.astype(z_ref.dtype).astype(jnp.float32)
        y = y * a + b
        y = y.astype(z_ref.dtype).astype(jnp.float32)
        v = v_s[:].astype(jnp.float32)
        i = i_s[:].astype(jnp.float32)
        if cell == "lif":
            v_dec = v + _DT * _TAU_MEM_INV * ((_V_LEAK - v) + i)
            i_dec = i - _DT * _TAU_SYN_INV * i
            spike = v_dec - _V_TH > 0
            v = jnp.where(spike, 0.0, v_dec)
            i = i_dec + y
            out = spike
        else:  # "li"
            i_jump = i + y
            v = v + _DT * _TAU_MEM_INV * ((_V_LEAK - v) + i_jump)
            i = i_jump - _DT * _TAU_SYN_INV * i_jump
            out = v
        v_s[:] = v.astype(v_s.dtype)
        i_s[:] = i.astype(i_s.dtype)
        z_ref[0] = out.astype(z_ref.dtype)

        @pl.when(t == pl.num_programs(2) - 1)
        def _():
            vT_ref[:] = v_s[:]
            iT_ref[:] = i_s[:]

    return kernel


def _pick_nb(N, bytes_per_image, acc_bytes_per_image,
             budget=10 * 1024 * 1024, acc_budget=512 * 1024):
    """Largest divisor of N whose per-grid-step VMEM footprint fits the
    budget (~10 MiB of the 16 MiB VMEM, leaving headroom for Mosaic's
    own temporaries and double buffering) AND whose fp32 matmul
    accumulator stays under ~512 KiB (128 vregs). Empirically (v5e,
    2026-08 libtpu) a single kernel value of ~934 KB crashes the
    Mosaic compiler subprocess outright while 467 KB compiles fine,
    across unrelated shapes — the accumulator is always the largest
    value, so cap it."""
    best = 1
    for nb in range(1, N + 1):
        if (
            N % nb == 0
            and nb * bytes_per_image <= budget
            and nb * acc_bytes_per_image <= acc_budget
        ):
            best = nb
    return best


@functools.partial(
    jax.jit, static_argnames=("cell", "stride", "interpret")
)
def _spiking_conv_seq_impl(x_seq, w, a, b, v0, i0, cell, stride, interpret):
    T, N, H, W, cin = x_seq.shape
    k = w.shape[0]
    cout = w.shape[-1]
    h_out, w_out = v0.shape[1], v0.shape[2]
    if stride == 2 and (H % 2 or W % 2):
        # Odd input + torch-convention symmetric padding: appending one
        # zero row/col makes the geometry even with identical outputs
        # (the extra row lands beyond every sampled tap or in the
        # existing zero-pad region), so the even-only kernel applies.
        x_seq = jnp.pad(
            x_seq, ((0, 0), (0, 0), (0, H % 2), (0, W % 2), (0, 0))
        )
        H += H % 2
        W += W % 2
    if stride == 2 and k == 1:
        # 1x1 stride-2 (no padding, torch convention) samples the even
        # phase only: pre-decimate in HBM and run the stride-1 kernel.
        x_seq = x_seq[:, :, ::2, ::2]
        H, W = h_out, w_out
        stride = 1
    # kernel as k*k (Cin, Cout) tap operands
    w_taps = w.reshape(k * k, cin, cout).astype(x_seq.dtype)
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    pad = k // 2
    if pad:
        xp = jnp.pad(
            x_seq, ((0, 0), (0, 0), (pad, pad), (pad, pad), (0, 0))
        )
    else:
        xp = x_seq

    rh = 1
    for cand in (8, 6, 5, 4, 3, 2):
        if h_out % cand == 0:
            rh = cand
            break
    hb = h_out // rh
    if stride == 1:
        hs = (rh - 1) + k           # slab rows per h-block
        ws = xp.shape[3]            # full (padded) row width
    else:
        # Phase pre-split (k=3 only; k=1 was reduced to stride 1
        # above): the padded input is decimated into its four
        # (row, col) phases of (h_out+1, w_out+1) each, and a slab
        # stacks the four phases back to back on the row axis so the
        # kernel needs only plain slices. xp is 2*h_out+2 rows by
        # 2*w_out+2 cols here (even H/W, pad 1), so each phase is
        # exactly h_out+1 by w_out+1.
        hs = 4 * (rh + 1)
        ws = w_out + 1
    # VMEM per image in a grid step: input slab + z block (x2 for
    # pipelining) + 4 state blocks + 2 state scratches + fp32 acc.
    esize = x_seq.dtype.itemsize
    ssize = v0.dtype.itemsize
    cpad = -(-cout // 128) * 128
    cinp = -(-cin // 128) * 128
    per_image = (
        2 * hs * ws * max(cinp, 128) * esize
        + 2 * rh * w_out * cpad * esize
        + 6 * rh * w_out * cpad * ssize
        + 4 * rh * w_out * cpad
    )
    nb = _pick_nb(N, per_image, rh * w_out * cpad * 4)
    # Pre-gather halo slabs: [T, N, HB, hs, ws, Cin]. Costs one extra
    # ~(hs/rh)x pass over x in HBM but lets every operand use a plain
    # blocked spec — Pallas double-buffers the DMAs itself (manual HBM
    # slices of tiled memrefs are rejected by Mosaic).
    if stride == 1:
        if hb > 1 or hs != xp.shape[2]:
            slabs = jnp.stack(
                [xp[:, :, i * rh: i * rh + hs] for i in range(hb)],
                axis=2,
            )
        else:
            slabs = xp[:, :, None]
    else:
        # [T, N, 4, h_out+1, w_out+1, cin] phase decomposition, then
        # per-h-block slabs of rh+1 phase rows folded to one row axis
        phases = jnp.stack(
            [xp[:, :, pa::2, pb::2] for pa in (0, 1) for pb in (0, 1)],
            axis=2,
        )
        slabs = jnp.stack(
            [
                phases[:, :, :, i * rh: i * rh + rh + 1].reshape(
                    T, N, hs, ws, cin
                )
                for i in range(hb)
            ],
            axis=2,
        )
    grid = (N // nb, hb, T)

    state_spec = pl.BlockSpec(
        (nb, rh, w_out, cout), lambda n, hb, t: (n, hb, 0, 0),
        memory_space=pltpu.VMEM,
    )
    z_spec = pl.BlockSpec(
        (1, nb, rh, w_out, cout), lambda n, hb, t: (t, n, hb, 0, 0),
        memory_space=pltpu.VMEM,
    )
    full = lambda shape: pl.BlockSpec(
        shape, lambda n, hb, t: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    x_spec = pl.BlockSpec(
        (1, nb, 1, hs, ws, cin), lambda n, hb, t: (t, n, hb, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )

    z, vT, iT = pl.pallas_call(
        _spiking_conv_kernel(cell, nb, rh, w_out, cin, k, stride),
        grid=grid,
        in_specs=[x_spec, full((k * k, cin, cout)), full((cout,)),
                  full((cout,)), state_spec, state_spec],
        out_specs=[z_spec, state_spec, state_spec],
        out_shape=[
            jax.ShapeDtypeStruct((T, N, h_out, w_out, cout), x_seq.dtype),
            jax.ShapeDtypeStruct((N, h_out, w_out, cout), v0.dtype),
            jax.ShapeDtypeStruct((N, h_out, w_out, cout), i0.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((nb, rh, w_out, cout), v0.dtype),
            pltpu.VMEM((nb, rh, w_out, cout), i0.dtype),
        ],
        interpret=interpret,
    )(slabs, w_taps, a, b, v0, i0)
    return z, vT, iT


def spiking_conv_seq(
    x_seq: jax.Array,   # [T, N, H, W, Cin] compute-dtype sequence
    w: jax.Array,       # [k, k, Cin, Cout] conv kernel, k in {1, 3}
    a: jax.Array,       # [Cout] folded eval-BN scale
    b: jax.Array,       # [Cout] folded eval-BN offset
    v0: jax.Array,      # [N, Hout, Wout, Cout] initial membrane
    i0: jax.Array,      # [N, Hout, Wout, Cout] initial current
    cell: str = "lif",
    stride: int = 1,
    interpret: bool | None = None,
):
    """Fused [kxk same-conv (stride 1 or 2) -> eval BN -> LIF/LI] over
    a whole sequence: returns (z_seq, v_T, i_T). Inference-path only
    (eval-mode BN, no truncation mask); callers fall back to the
    unfused seq path for training/recording."""
    if cell not in ("lif", "li"):
        raise ValueError(f"unsupported cell {cell!r}")
    if w.shape[0] not in (1, 3):
        raise ValueError(f"unsupported kernel size {w.shape[0]}")
    if stride not in (1, 2):
        raise ValueError(f"unsupported stride {stride}")
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    return _spiking_conv_seq_impl(
        x_seq, w, a, b, v0, i0, cell, stride, interpret
    )
