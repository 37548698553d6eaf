"""Flash (online-softmax) multi-head attention kernel.

The crosstransformer's self-attention materializes (B, H, T, S) logits
— at T=S=2688 that is the single largest HBM cost in the v4 graph
(reference hot loop src/layers.cpp:454-482 has the same structure as a
per-head GEMM loop). This kernel streams K/V blocks through VMEM with
the standard running-max/running-sum rescaling, so only (T, D) tiles
ever hit HBM.

Non-causal only (Demucs attends fully); f32 accumulators; logits matmul
in the input dtype with f32 accumulation.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# Interpret-mode gate for the MESH-AWARE wrappers (flash_mha_p /
# flash_mha_fwd_p / flash_mha_bwd_p): tests on the virtual CPU mesh set
# this True so the partitioned flash path traces+executes off-TPU. Read
# at trace/lowering time.
INTERPRET: bool = False


def _mha_kernel(q_ref, k_ref, v_ref, o_ref, *, bs: int, sm_scale: float):
    """One (batch*head, T-block) program: stream all S blocks of K/V.

    q_ref: (1, BT, D), k_ref/v_ref: (1, S, D), o_ref: (1, BT, D).
    """
    _, bt, d = q_ref.shape
    s_total = k_ref.shape[1]
    n_blocks = s_total // bs

    # matmul operands stay in the input dtype (bf16 hits the MXU's native
    # rate); accumulation and the softmax state are f32
    q = q_ref[0]

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(i * bs, bs), :]
        v = v_ref[0, pl.ds(i * bs, bs), :]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale  # (BT, BS) f32
        m_cur = jnp.max(logits, axis=-1, keepdims=True)   # (BT, 1)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(logits - m_new)                       # (BT, BS)
        alpha = jnp.exp(m_prev - m_new)                   # (BT, 1)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # (BT, D)
        return acc, m_new, l_new

    acc = jnp.zeros((bt, d), jnp.float32)
    m0 = jnp.full((bt, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bt, 1), jnp.float32)
    acc, _, l = jax.lax.fori_loop(0, n_blocks, body, (acc, m0, l0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def _pick_block(n: int, target: int = 896) -> int:
    """Largest divisor of n that is <= target and a multiple of 8.

    target=896 measured ~10% faster than 448/512 at the v4 freq length
    (T=S=2688, D=64): fewer K/V streaming rounds and rescale passes per
    output tile; full-row (S=2688) blocks fail to compile (VMEM)."""
    best = 0
    for b in range(8, min(n, target) + 1, 8):
        if n % b == 0:
            best = b
    return best


def flash_supported(t: int, s: int) -> bool:
    """True when both sequence lengths have a multiple-of-8 divisor —
    call sites fall back to the XLA einsum path otherwise."""
    return bool(_pick_block(t)) and bool(_pick_block(s))


@functools.partial(jax.jit, static_argnames=("interpret",))
def flash_mha(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
              interpret: bool = False) -> jnp.ndarray:
    """q: (B, H, T, D), k/v: (B, H, S, D) -> (B, H, T, D).

    Softmax over S with 1/sqrt(D) scaling. T and S must have a
    divisor that is a multiple of 8 (true for all Demucs lengths);
    check flash_supported() first.
    """
    B, H, T, D = q.shape
    S = k.shape[2]
    # VMEM-aware block targets: at bf16 the (896, S) f32 logits tile +
    # double-buffered K/V fit the 16 MB scoped budget; f32 operands
    # double the K/V resident bytes, so halve the q block (measured
    # OOM otherwise: 16.62M > 16M at (48, 2688, 64) f32 inside the
    # fused track program)
    f32_operands = jnp.dtype(q.dtype).itemsize >= 4
    bt = _pick_block(T, target=448 if f32_operands else 896)
    # full-S KV blocks win at Demucs lengths (3.20 vs 3.43 ms at
    # T=S=2688 with bt=896): one softmax pass, no online rescaling
    # rounds; logits stay under VMEM (896x2688 f32 = 9.6 MB). Full-T
    # q blocks (bt=2688) still fail to compile.
    bs = _pick_block(S, target=2688)
    if not bt or not bs:
        raise ValueError(f"unsupported seq lens T={T}, S={S}")
    sm_scale = 1.0 / math.sqrt(D)

    qf = q.reshape(B * H, T, D)
    kf = k.reshape(B * H, S, D)
    vf = v.reshape(B * H, S, D)

    grid = (B * H, T // bt)
    out = pl.pallas_call(
        functools.partial(_mha_kernel, bs=bs, sm_scale=sm_scale),
        out_shape=jax.ShapeDtypeStruct((B * H, T, D), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bt, D), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, S, D), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, S, D), lambda b, t: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bt, D), lambda b, t: (b, t, 0)),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(B, H, T, D)


# --- training: flash backward ----------------------------------------------
#
# The einsum VJP materializes logits/P/dP/dS — four (B*H, T, S) f32
# tensors per attention (at T=S=2688, B*H=16 that is ~1.8 GB of HBM
# traffic per layer). The flash backward recomputes P blockwise from
# the forward's logsumexp, so only (tile, S) logits ever exist, in
# VMEM. Standard two-kernel split: dQ on the T grid, dK/dV on the S
# grid; delta = rowsum(dO * O) is a cheap fused XLA prepass.


def _mha_fwd_lse_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *,
                        bs: int, sm_scale: float):
    """Forward that also writes the per-row logsumexp (training path).

    Same streaming schedule as _mha_kernel; lse = m + log(l) of the
    SCALED logits, which is all the backward needs to rebuild P."""
    _, bt, d = q_ref.shape
    s_total = k_ref.shape[1]
    n_blocks = s_total // bs
    q = q_ref[0]

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(i * bs, bs), :]
        v = v_ref[0, pl.ds(i * bs, bs), :]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale
        m_cur = jnp.max(logits, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(logits - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc = jnp.zeros((bt, d), jnp.float32)
    m0 = jnp.full((bt, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bt, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, n_blocks, body, (acc, m0, l0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log(l)          # (bt, 1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def flash_mha_fwd(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                  interpret: bool = False):
    """Forward returning (out, lse) for the training VJP.

    q: (B, H, T, D), k/v: (B, H, S, D) -> out (B, H, T, D),
    lse (B*H, T, 1) f32 logsumexp of the scaled logits."""
    B, H, T, D = q.shape
    S = k.shape[2]
    f32_operands = jnp.dtype(q.dtype).itemsize >= 4
    bt = _pick_block(T, target=448 if f32_operands else 896)
    bs = _pick_block(S, target=2688)
    if not bt or not bs:
        raise ValueError(f"unsupported seq lens T={T}, S={S}")
    sm_scale = 1.0 / math.sqrt(D)
    qf = q.reshape(B * H, T, D)
    kf = k.reshape(B * H, S, D)
    vf = v.reshape(B * H, S, D)
    grid = (B * H, T // bt)
    out, lse = pl.pallas_call(
        functools.partial(_mha_fwd_lse_kernel, bs=bs, sm_scale=sm_scale),
        out_shape=[jax.ShapeDtypeStruct((B * H, T, D), q.dtype),
                   jax.ShapeDtypeStruct((B * H, T, 1), jnp.float32)],
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bt, D), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, S, D), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, S, D), lambda b, t: (b, 0, 0)),
        ],
        out_specs=[pl.BlockSpec((1, bt, D), lambda b, t: (b, t, 0)),
                   pl.BlockSpec((1, bt, 1), lambda b, t: (b, t, 0))],
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(B, H, T, D), lse


def _mha_bwd_fused_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                          dq_ref, dk_ref, dv_ref, *, sm_scale: float):
    """One (batch*head, T-block) program: dQ tile out, dK/dV
    accumulated into full-S f32 blocks resident across the T axis
    (out index map ignores t; the t axis is marked "arbitrary" so
    Mosaic keeps the block and iterates it innermost).

    Computes p/ds ONCE and derives all three grads — the two-kernel
    split recomputed logits and the exp twice (7 matmuls + 2 softmax
    rebuilds; this is the minimal 5 + 1)."""
    t = pl.program_id(1)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0]          # (bt, 1)
    delta = delta_ref[0]      # (bt, 1)
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale       # (bt, S)
    p = jnp.exp(logits - lse)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (bt, S)
    ds = p * (dp - delta)                                    # (bt, S) f32
    dq = jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale
    dq_ref[0] = dq.astype(dq_ref.dtype)

    @pl.when(t == 0)
    def _init():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    dsb = ds.astype(q.dtype)
    dk_ref[0] += jax.lax.dot_general(
        dsb, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale       # (S, D)
    dv_ref[0] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (S, D)


@functools.partial(jax.jit, static_argnames=("interpret",))
def flash_mha_bwd(q, k, v, o, lse, do, interpret: bool = False):
    """dQ/dK/dV without materializing (B*H, T, S) in HBM.

    Inputs as flash_mha_fwd; do is the output cotangent (B, H, T, D).
    Returns (dq, dk, dv) in the operand dtypes."""
    B, H, T, D = q.shape
    S = k.shape[2]
    f32_operands = jnp.dtype(q.dtype).itemsize >= 4
    # The fused kernel keeps p/dp/ds (bt, S) f32 tiles PLUS the
    # resident full-S f32 dK/dV accumulator blocks in scoped VMEM:
    # at T=S=2688 bt=896 measured 19.3M > the 16M limit and bt=672
    # landed at 16.1M inside the train graph (cross-attention layout) —
    # 448 leaves real margin. f32 operands double the streamed tiles
    # again -> 224.
    bt = _pick_block(T, target=224 if f32_operands else 448)
    if not bt:
        raise ValueError(f"unsupported seq lens T={T}, S={S}")
    sm_scale = 1.0 / math.sqrt(D)
    qf = q.reshape(B * H, T, D)
    kf = k.reshape(B * H, S, D)
    vf = v.reshape(B * H, S, D)
    of = o.reshape(B * H, T, D)
    dof = do.reshape(B * H, T, D)
    # delta_t = sum_d dO * O — a cheap fused elementwise+reduce in XLA
    delta = jnp.sum(dof.astype(jnp.float32) * of.astype(jnp.float32),
                    axis=-1, keepdims=True)                  # (B*H, T, 1)

    dq, dk, dv = pl.pallas_call(
        functools.partial(_mha_bwd_fused_kernel, sm_scale=sm_scale),
        out_shape=[jax.ShapeDtypeStruct((B * H, T, D), q.dtype),
                   jax.ShapeDtypeStruct((B * H, S, D), jnp.float32),
                   jax.ShapeDtypeStruct((B * H, S, D), jnp.float32)],
        grid=(B * H, T // bt),
        in_specs=[
            pl.BlockSpec((1, bt, D), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, S, D), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, S, D), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, bt, D), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, bt, 1), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, bt, 1), lambda b, t: (b, t, 0)),
        ],
        out_specs=[pl.BlockSpec((1, bt, D), lambda b, t: (b, t, 0)),
                   pl.BlockSpec((1, S, D), lambda b, t: (b, 0, 0)),
                   pl.BlockSpec((1, S, D), lambda b, t: (b, 0, 0))],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(qf, kf, vf, dof, lse, delta)
    shape = (B, H, T, D), (B, H, S, D)
    return (dq.reshape(shape[0]), dk.reshape(shape[1]).astype(k.dtype),
            dv.reshape(shape[1]).astype(v.dtype))


# --- mesh-native wrappers ---------------------------------------------------
#
# A bare pallas_call lowers to an opaque custom call that GSPMD/Shardy
# cannot partition: on a >1-device mesh the partitioner FULLY REPLICATES
# it — every device all-gathers the whole (B*H, T, D) operands and
# computes the entire attention redundantly (measured on the 8-device
# CPU mesh: 15 all-gathers around one flash call). These wrappers
# register the partitioning rule the kernel's math implies — batch and
# head dims shard freely (programs are independent along the B*H grid
# axis), sequence and head_dim must be replicated (softmax reduces over
# S; D is contracted) — so the dp/tp-sharded separator and the sharded
# train step keep flash instead of falling back to einsum attention
# (reference hot loop src/layers.cpp:454-482).
#
# lse crosses the wrapper boundary as (B, H, T) so every dim carries a
# named factor in the sharding rule (the kernels' internal (B*H, T, 1)
# layout has a merged dim Shardy cannot attach b/h shardings to).

from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec


def _bh_sharding(sharding, ndim: int):
    """Keep the (batch, head) dim shardings, replicate the rest."""
    spec = getattr(sharding, "spec", None)
    if spec is None:
        return sharding  # non-Named sharding: leave untouched
    lead = tuple(spec[i] if i < len(spec) else None for i in range(2))
    return NamedSharding(sharding.mesh,
                         PartitionSpec(*lead, *(None,) * (ndim - 2)))


def _bh_partition(local_fn):
    """partition= callback: shard b/h per the FIRST operand (q), run the
    local kernel on per-shard shapes."""

    def partition(mesh, arg_shapes, result_shape):
        q_sh = arg_shapes[0].sharding
        arg_shardings = tuple(_bh_sharding(q_sh, len(a.shape))
                              for a in arg_shapes)
        results = jax.tree.leaves(result_shape)
        result_shardings = jax.tree.unflatten(
            jax.tree.structure(result_shape),
            [_bh_sharding(q_sh, len(r.shape)) for r in results])
        return mesh, local_fn, result_shardings, arg_shardings

    return partition


def _bh_infer(n_out: int):
    """infer_sharding_from_operands= (GSPMD fallback; Shardy uses the
    string rule): results follow q's b/h sharding."""

    def infer(mesh, arg_shapes, result_shape):
        q_sh = arg_shapes[0].sharding
        results = jax.tree.leaves(result_shape)
        shardings = [_bh_sharding(q_sh, len(r.shape)) for r in results]
        return (jax.tree.unflatten(jax.tree.structure(result_shape),
                                   shardings)
                if n_out > 1 else shardings[0])

    return infer


@custom_partitioning
def flash_mha_p(q, k, v):
    """Partition-aware flash_mha: q (B,H,T,D), k/v (B,H,S,D) ->
    (B,H,T,D); shards over batch/head mesh axes, replicates T/S/D."""
    return flash_mha(q, k, v, interpret=INTERPRET)


flash_mha_p.def_partition(
    partition=_bh_partition(
        lambda q, k, v: flash_mha(q, k, v, interpret=INTERPRET)),
    infer_sharding_from_operands=_bh_infer(1),
    sharding_rule="b h t d, b h s d, b h s d -> b h t d",
    need_replication_factors=("t", "d", "s"),
)


@custom_partitioning
def flash_mha_fwd_p(q, k, v):
    """Partition-aware flash_mha_fwd; lse is (B, H, T) f32."""
    out, lse = flash_mha_fwd(q, k, v, interpret=INTERPRET)
    B, H, T, _ = q.shape
    return out, lse.reshape(B, H, T)


def _fwd_local(q, k, v):
    out, lse = flash_mha_fwd(q, k, v, interpret=INTERPRET)
    return out, lse.reshape(q.shape[0], q.shape[1], q.shape[2])


flash_mha_fwd_p.def_partition(
    partition=_bh_partition(_fwd_local),
    infer_sharding_from_operands=_bh_infer(2),
    sharding_rule="b h t d, b h s d, b h s d -> b h t d, b h t",
    need_replication_factors=("t", "d", "s"),
)


@custom_partitioning
def flash_mha_bwd_p(q, k, v, o, lse, do):
    """Partition-aware flash_mha_bwd; lse is (B, H, T) f32."""
    B, H, T = lse.shape
    return flash_mha_bwd(q, k, v, o, lse.reshape(B * H, T, 1), do,
                         interpret=INTERPRET)


def _bwd_local(q, k, v, o, lse, do):
    B, H, T = lse.shape
    return flash_mha_bwd(q, k, v, o, lse.reshape(B * H, T, 1), do,
                         interpret=INTERPRET)


flash_mha_bwd_p.def_partition(
    partition=_bh_partition(_bwd_local),
    infer_sharding_from_operands=_bh_infer(3),
    sharding_rule=("b h t d, b h s d, b h s d, b h t d, b h t, b h t d"
                   " -> b h t d, b h s d, b h s d"),
    need_replication_factors=("t", "d", "s"),
)
