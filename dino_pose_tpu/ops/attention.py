"""Multi-head attention for short ViT sequences.

The DINOv2 backbones run a fixed 257-token sequence (16x16 patches + CLS at
224x224 input, /root/reference/model/dinov2_pose.py:147-151). That is small
enough that an entire (S, S) score tile fits in VMEM, so the Pallas kernel is a
"single-block flash attention": one fused QK^T -> masked softmax -> PV pass per
(batch, head) program, with the sequence padded to a lane-aligned length and
padding keys masked. No online-softmax bookkeeping is needed at this size and
the softmax never round-trips through HBM.

The backward pass is a Pallas kernel too (one program per (batch, head):
probabilities are rematerialised q-chunk by q-chunk so no (S, S) tensor ever
reaches HBM in either direction), with an XLA fallback for CPU/odd shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dino_pose_tpu.ops.dispatch import target as _dispatch_target

_LANES = 128
_NEG_INF = -1e30


def xla_attention(q, k, v, scale: float):
    """Reference attention. q,k,v: (B, H, S, D). Softmax in float32."""
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(scores * scale, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.float32).astype(
        q.dtype
    )


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, valid_len: int):
    """One program = ``G`` independent (head, batch) attentions.

    Scores never leave VMEM — this is the whole win over the XLA path, which
    materialises the (BH, S, S) float32 score tensor in HBM (measured 15.4 ms
    for the 12-layer dinov2-small forward at bs=128 vs ~1 ms fused).
    """
    q = q_ref[...]  # (G, Sp, D)
    k = k_ref[...]
    v = v_ref[...]
    scores = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (G, Sp, Sp)
    scores = scores * scale
    sp = scores.shape[-1]
    if valid_len < sp:
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, dimension=2)
        scores = jnp.where(col < valid_len, scores, _NEG_INF)
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)
    o_ref[...] = jax.lax.dot_general(
        probs.astype(v.dtype),
        v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _heads_per_program(bh: int, sp: int, d: int, itemsize: int) -> int:
    """Largest G dividing bh whose working set fits comfortably in VMEM;
    0 when even one head-program exceeds the budget (the f32 score tile is
    4*sp^2 alone — past ~S 1600 nothing fits and callers must stay on the
    XLA path; ``attention()`` gates on this)."""
    budget = 10 * 1024 * 1024  # leave headroom under ~16 MB
    for g in (16, 8, 4, 2, 1):
        if bh % g:
            continue
        scores = g * sp * sp * 4  # float32
        tensors = 4 * g * sp * d * itemsize
        if scores + tensors <= budget:
            return g
    return 0


def flash_fits(batch: int, heads: int, seq: int, head_dim: int, itemsize: int) -> bool:
    """True when the flash kernel's per-program working set fits VMEM."""
    sp = -(-seq // 8) * 8
    return _heads_per_program(batch * heads, sp, head_dim, itemsize) >= 1


def _pallas_forward(q, k, v, scale: float):
    b, h, s, d = q.shape
    # Pad the sequence only to sublane granularity (8): Mosaic pads the lane
    # dimension inside VMEM for free, while HBM-level padding to 128 would
    # copy the whole q/k/v once more per layer.
    sp = -(-s // 8) * 8
    pad = [(0, 0), (0, 0), (0, sp - s), (0, 0)]
    qp, kp, vp = (jnp.pad(t, pad) for t in (q, k, v))

    def reshape(t):
        return t.reshape(b * h, sp, d)

    qp, kp, vp = reshape(qp), reshape(kp), reshape(vp)
    g = _heads_per_program(b * h, sp, d, q.dtype.itemsize)
    if g == 0:
        raise ValueError(
            f"flash kernel working set exceeds VMEM at (S={s}, dh={d}); "
            "gate with flash_fits before dispatching"
        )
    spec = pl.BlockSpec((g, sp, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, valid_len=s),
        grid=(b * h // g,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b * h, sp, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sp * sp * d,
            bytes_accessed=4 * b * h * sp * d * q.dtype.itemsize,
            transcendentals=b * h * sp * sp,
        ),
        interpret=_dispatch_target()[0] != "tpu",  # CPU runs interpreted
    )(qp, kp, vp)
    return out.reshape(b, h, sp, d)[:, :, :s, :]


def _flash_bwd_kernel(
    q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref,
    *, scale: float, valid_len: int, chunk: int,
):
    """dq/dk/dv for one (batch, head): flash-style rematerialisation.

    Probabilities are recomputed per q-chunk, so the live f32 score tiles are
    (chunk, Sp) — never the full (Sp, Sp) — and dk/dv accumulate in VMEM f32.
    Each chunk's score rows are COMPLETE rows, so the softmax (with its own
    row max) is exact; no saved logsumexp from the forward is needed.
    Padded q rows carry zero cotangent and padded k columns are masked to
    -inf, so every padded-lane contribution is exactly zero.
    """
    q = q_ref[0]   # (Sp, D)
    k = k_ref[0]
    v = v_ref[0]
    do = g_ref[0]
    sp, d = q.shape
    dk = jnp.zeros((sp, d), jnp.float32)
    dv = jnp.zeros((sp, d), jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (chunk, sp), 1)
    for i in range(sp // chunk):
        sl = slice(i * chunk, (i + 1) * chunk)
        qi = q[sl]
        doi = do[sl]
        s = jax.lax.dot_general(
            qi, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                        # (chunk, Sp) f32
        if valid_len < sp:
            s = jnp.where(col < valid_len, s, _NEG_INF)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)       # f32
        dp = jax.lax.dot_general(
            doi, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                # (chunk, Sp) f32
        ds = p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))
        pb = p.astype(do.dtype)
        dsb = ds.astype(q.dtype)
        dv = dv + jax.lax.dot_general(
            pb, doi, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                # (Sp, D)
        dk = dk + jax.lax.dot_general(
            dsb, qi, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        dq_ref[0, sl, :] = (
            jax.lax.dot_general(
                dsb, k, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
        ).astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


_BWD_CHUNK = 128


def _bwd_chunk(s: int) -> tuple[int, int]:
    """(padded_seq, q_chunk) for the backward kernel.

    The chunk loop is UNROLLED in the kernel body, so the sequence is padded
    up to a multiple of a fixed 128-row chunk to bound the unroll at
    ceil(S/128) iterations — choosing whatever small chunk happens to divide
    the 8-aligned length (e.g. 8 rows at Sp=584) produced 70+ unrolled
    iterations and pathological Mosaic compile times (measured: >20 min at
    S=577). Short sequences run as one chunk.
    """
    if s <= _BWD_CHUNK:
        sp = -(-s // 8) * 8
        return sp, sp
    sp = -(-s // _BWD_CHUNK) * _BWD_CHUNK
    return sp, _BWD_CHUNK


def _pallas_backward(q, k, v, g, scale: float):
    b, h, s, d = q.shape
    sp, chunk = _bwd_chunk(s)
    pad = [(0, 0), (0, 0), (0, sp - s), (0, 0)]
    qp, kp, vp, gp = (
        jnp.pad(t, pad).reshape(b * h, sp, d) for t in (q, k, v, g)
    )
    spec = pl.BlockSpec((1, sp, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((b * h, sp, d), q.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _flash_bwd_kernel, scale=scale, valid_len=s, chunk=chunk
        ),
        grid=(b * h,),
        in_specs=[spec] * 4,
        out_specs=[spec] * 3,
        out_shape=[shape] * 3,
        cost_estimate=pl.CostEstimate(
            flops=10 * b * h * sp * sp * d,
            bytes_accessed=7 * b * h * sp * d * q.dtype.itemsize,
            transcendentals=b * h * sp * sp,
        ),
        interpret=_dispatch_target()[0] != "tpu",
    )(qp, kp, vp, gp)

    def unpad(t):
        return t.reshape(b, h, sp, d)[:, :, :s, :]

    return unpad(dq), unpad(dk), unpad(dv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q, k, v, scale: float):
    return _pallas_forward(q, k, v, scale)


def _fwd(q, k, v, scale):
    return _pallas_forward(q, k, v, scale), (q, k, v)


def _bwd(scale, residuals, g):
    q, k, v = residuals
    return _pallas_backward(q, k, v, g, scale)


flash_attention.defvjp(_fwd, _bwd)


# Sequence length above which the flash kernel beats XLA's unfused path,
# measured end-to-end on TPU v5e (see PERFORMANCE.md "518-input" table):
# at S=257 XLA wins (44.3 vs 49.3 ms/step r1; the f32 score traffic is
# cheap and the per-program pipeline overhead dominates), while at longer
# sequences the O(S^2) HBM score traffic grows quadratically and the
# VMEM-resident kernel takes over.
FLASH_MIN_SEQ = 512


def attention(q, k, v, scale: float, *, use_pallas: bool | None = None):
    """Shape-aware dispatch: Pallas flash kernel on TPU for long sequences
    (S >= FLASH_MIN_SEQ), XLA's fused unfused-attention otherwise.

    ``DINO_POSE_TPU_ATTENTION=xla|pallas`` overrides (benchmarking hook).
    """
    if use_pallas is None:
        import os

        override = os.environ.get("DINO_POSE_TPU_ATTENTION", "").lower()
        if override in ("xla", "pallas"):
            use_pallas = override == "pallas"
        else:
            b, h, s, dh = q.shape
            use_pallas = (
                _dispatch_target()[0] == "tpu"
                and s >= FLASH_MIN_SEQ
                # Past ~S 1600 the f32 score tile alone exceeds VMEM:
                # stay on XLA instead of shipping an uncompilable kernel.
                and flash_fits(b, h, s, dh, q.dtype.itemsize)
            )
    if use_pallas:
        return flash_attention(q, k, v, scale)
    return xla_attention(q, k, v, scale)
