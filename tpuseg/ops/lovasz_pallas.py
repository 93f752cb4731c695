"""Pallas TPU kernels for the sort-free Lovász-softmax loss.

Why a kernel at all: the Lovász loss needs per-pixel ranks among
descending errors. The exact ``lax.sort`` costs 26x the whole train step
on v5e (measured: 4110 -> 156 imgs/s, batch 128 @256x128), and the
pure-XLA level-set reformulation (tpuseg/train/loss.py::_binned_lovasz)
still pays ~550 ms/step because XLA re-reads the [C, P] error plane once
per threshold chunk — it has no way to express "load a pixel tile once,
bin it against all 256 thresholds from registers". That read-once
structure is exactly a Pallas kernel (docs/DESIGN.md §45 has the measured
ladder).

Two kernels, both built on a two-level 16x16 one-hot decomposition of the
256-bin index (b = 16a + d):

- ``_hist_kernel``: per-class per-bin histograms of {count, foreground,
  error-sum}. The [T]-pixel tile builds coarse/fine one-hots A[16, T] /
  B[16, T] from ``broadcasted_iota`` compares and contracts
  ``[A; A*fg; A*e] [48, T] x B^T -> [48, 16]`` on the MXU — a histogram
  as an outer-product matmul, no scatter, no sort, errors read ONCE.
- ``_lookup_kernel``: per-pixel coefficient w_p = coef[c, bin(e_p)]
  without a gather: w = sum_d B[d, p] * (coef^T A)[d, p] — one [16, 16] x
  [16, T] matmul and a sublane reduce.

The loss is then ``sum(e * stop_grad(w))``: its value is algebraically
the binned level-set formula, and its gradient d/de_i = w_i is the
classic Lovász coefficient (delta-Jaccard of the pixel's bin / bin
population) — the same "ranks are locally constant" semantics autodiff
gives the exact sort. ``jax.custom_vjp`` wires that up with w as the only
residual.

Reference formulation: Berman et al., CVPR 2018 (the reference repo
trains plain CE, main.py:99 — no counterpart). Both kernels run under
``interpret=True`` on CPU for CI (tests/test_loss.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NB = 256          # bins = 16 coarse x 16 fine
_SIDE = 16
_TILE = 16384     # pixels per grid step; [48, T] f32 lhs = 3.1 MB VMEM


def _one_hots(e, dtype):
    """coarse/fine one-hots [16, St, 128] for bin(e) = clip(floor(e*NB)).

    Padding pixels carry e < 0 and are masked out of both one-hots (they
    enter no bin, so histograms and lookups both see exactly the real
    pixels). ``e`` is the [St, 128] tile (pixels split over sublane x
    lane, the Mosaic-native block shape).
    """
    ln = e.shape[-1]
    b = jnp.clip((e * NB).astype(jnp.int32), 0, NB - 1)      # [1, T]
    valid = e >= 0.0
    ia = jax.lax.broadcasted_iota(jnp.int32, (_SIDE, ln), 0)
    a = ((ia == b // _SIDE) & valid).astype(dtype)            # [16, T]
    d = ((ia == b % _SIDE) & valid).astype(dtype)             # [16, T]
    return a, d


def _hist_kernel(e_ref, fg_ref, out_ref):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    e = e_ref[0, 0]                                           # [1, T]
    fg = fg_ref[0, 0]
    a, d = _one_hots(e, e.dtype)
    lhs = jnp.concatenate([a, a * fg, a * e], axis=0)         # [48, T]
    h = jax.lax.dot_general(
        lhs, d,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                         # [48, 16]
    out_ref[0, :, :] += h


def _lookup_kernel(e_ref, coef_t_ref, out_ref):
    e = e_ref[0, 0]                                           # [1, T]
    a, d = _one_hots(e, e.dtype)
    coef_t = coef_t_ref[0, :, :]                              # [16, 16] (d, a)
    tmp = jax.lax.dot_general(
        coef_t, a,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                         # [16(d), T]
    out_ref[0, 0] = jnp.sum(tmp * d, axis=0, keepdims=True)   # [1, T]


def _pad_tiles(x, fill):
    """Pad [C, P] to [C, nt, St, 128] tiles (Mosaic-aligned block shape).

    St is a multiple of 8 so (St, 128) meets the TPU lowering's last-two-
    dims rule; tiny inputs round up to one (8, 128) tile."""
    c, p = x.shape
    tile = min(_TILE, max(128, -(-p // 128) * 128))
    nt = -(-p // tile)
    pad = nt * tile - p
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)), constant_values=fill)
    # [C, nt, 1, tile]: the block (1, 1, 1, tile) then satisfies the
    # lowering's last-two-dims rule (1 == the array dim; tile % 128 == 0)
    # and the kernel sees a plain [1, T] row — every dot stays 2D, which
    # is what tpu.matmul supports.
    return x.reshape(c, nt, 1, tile), tile, nt


def _vma(psum_axes):
    """Under shard_map with vma checking, a pallas_call must declare how
    its outputs vary across the mesh: per-device histograms/lookups vary
    across every sharded axis until the explicit psum."""
    return {"vma": frozenset(psum_axes)} if psum_axes else {}


def _histograms(errors, fg, interpret, psum_axes=()):
    """[C, NB] per-bin {count, fg-sum, error-sum} histograms."""
    c, p = errors.shape
    e_pad, tile, nt = _pad_tiles(errors, -1.0)
    fg_pad, _, _ = _pad_tiles(fg, 0.0)
    blk = pl.BlockSpec((1, 1, 1, tile), lambda ci, i: (ci, i, 0, 0),
                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _hist_kernel,
        grid=(c, nt),
        in_specs=[blk, blk],
        out_specs=pl.BlockSpec((1, 3 * _SIDE, _SIDE),
                               lambda ci, i: (ci, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (c, 3 * _SIDE, _SIDE), jnp.float32, **_vma(psum_axes)
        ),
        interpret=interpret,
    )(e_pad, fg_pad)
    # rows 0..15 = count, 16..31 = fg, 32..47 = error-sum; bin = 16a + d
    out = out.reshape(c, 3, NB)
    return out[:, 0], out[:, 1], out[:, 2]


def _coefficients(h_n, h_f, h_s):
    """Per-bin Lovász coefficients coef[c, b] = delta_jaccard / bin count,
    already scaled by the present-class mean — so that
    loss == sum(e * w) == mean over present classes of the binned
    Lovász-softmax value. Pure [C, NB] arithmetic (XLA).
    """
    # cumulative-from-the-top level sums: N/F at level j = sums over bins>=j
    n_cum = jnp.cumsum(h_n[:, ::-1], axis=1)[:, ::-1]
    f_cum = jnp.cumsum(h_f[:, ::-1], axis=1)[:, ::-1]
    gts = f_cum[:, :1]                                        # total fg
    jac = 1.0 - (gts - f_cum) / jnp.maximum(gts + n_cum - f_cum, 1.0)
    zero = jnp.zeros_like(jac[:, :1])
    jac_next = jnp.concatenate([jac[:, 1:], zero], axis=1)    # empty prefix
    delta = jac - jac_next
    present = (gts[:, 0] > 0).astype(jac.dtype)
    scale = present / jnp.maximum(jnp.sum(present), 1.0)
    coef = delta / jnp.maximum(h_n, 1.0) * scale[:, None]
    # the error-sum histogram gives the loss VALUE without the lookup pass
    value = jnp.sum(h_s * delta / jnp.maximum(h_n, 1.0) * scale[:, None])
    return coef, value


def _lookup(errors, coef, interpret, psum_axes=()):
    c, p = errors.shape
    e_pad, tile, nt = _pad_tiles(errors, -1.0)
    blk = pl.BlockSpec((1, 1, 1, tile), lambda ci, i: (ci, i, 0, 0),
                       memory_space=pltpu.VMEM)
    w = pl.pallas_call(
        _lookup_kernel,
        grid=(c, nt),
        in_specs=[
            blk,
            pl.BlockSpec((1, _SIDE, _SIDE), lambda ci, i: (ci, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct(
            (c, nt, 1, tile), jnp.float32, **_vma(psum_axes)
        ),
        interpret=interpret,
    )(e_pad, jnp.swapaxes(coef.reshape(c, _SIDE, _SIDE), 1, 2))
    return w.reshape(c, -1)[:, :p]


def _fwd_impl(errors, fg, interpret, psum_axes):
    h_n, h_f, h_s = _histograms(errors, fg, interpret, psum_axes)
    if psum_axes:
        # sharded batch (shard_map region): histograms are additive over
        # pixels, so ONE psum of the tiny [C, NB] stats globalizes them;
        # coef/value below are pure functions of the global histograms and
        # compute identically (replicated) on every device, while the
        # lookup stays local — no error-plane collective ever happens.
        h_n, h_f, h_s = jax.lax.psum((h_n, h_f, h_s), psum_axes)
    coef, value = _coefficients(h_n, h_f, h_s)
    w = _lookup(errors, coef, interpret, psum_axes)
    # `value` (the histogram telescoped sum) == sum_global(e * w) to f32
    # rounding; returning it keeps the forward collective-free beyond the
    # histogram psum, and the saved residual w IS the local gradient.
    return value, w


@functools.lru_cache(maxsize=8)
def _make_op(interpret: bool, psum_axes: tuple):
    @jax.custom_vjp
    def op(errors, fg):
        loss, _ = _fwd_impl(errors, fg, interpret, psum_axes)
        return loss

    def fwd(errors, fg):
        loss, w = _fwd_impl(errors, fg, interpret, psum_axes)
        return loss, w

    def bwd(w, g):
        return g * w, jnp.zeros_like(w)

    op.defvjp(fwd, bwd)
    return op


def lovasz_binned_pallas(errors, fg, interpret=False, psum_axes=()):
    """Binned Lovász-softmax from [C, P] errors/foreground — scalar loss.

    Differentiable in ``errors`` (d/de_i = the pixel's bin coefficient,
    the exact-sort algorithm's own autodiff semantics); ``fg`` is a
    constant (one-hot targets). ``psum_axes``: mesh axis names when called
    per-shard inside a shard_map region (make_loss_fn wires this up).
    """
    return _make_op(bool(interpret), tuple(psum_axes))(errors, fg)


def make_sharded_lovasz(mesh, spatial=False, ignore_index=None,
                        interpret=False):
    """Multi-device lovasz at the logits level: forward-only shard_map.

    Autodiff cannot safely transpose a shard_map whose region holds a
    pallas_call: vma checking rejects the kernel's out_shape (and the
    interpret lowering trips on declared vma), while ``check_vma=False``
    silently scales the transpose cotangent by 1/mesh.size (both measured,
    tests/test_loss.py). So nothing here is ever transposed: the region
    computes BOTH the loss value and the analytic logits-gradient with
    forward-only ops — per-device histograms, ONE [C, bins] psum, local
    coefficient lookups, then the closed-form softmax chain

        dL/dz_k = wt_k * p_k - p_k * sum_c wt_c * p_c,
        wt_c    = w_c * sign(p_c - fg_c) * valid

    (the exact jacobian-vector product autodiff would build from
    loss = sum |fg - p| * stop_grad(w)) — and a custom_vjp OUTSIDE the
    shard_map returns g * grad. ``targets`` rides as float so the vjp can
    hand back an ordinary zero cotangent.
    """
    from jax.sharding import PartitionSpec as P

    axes = ("data",) + (("spatial",) if spatial else ())
    spec_x = P("data", "spatial" if spatial else None, None, None)
    spec_y = P("data", "spatial" if spatial else None, None)

    def region(logits, targets_f):
        dtype = jnp.promote_types(logits.dtype, jnp.float32)
        targets = targets_f.astype(jnp.int32)
        logp = jax.nn.log_softmax(logits.astype(dtype), axis=-1)
        onehot = jax.nn.one_hot(targets, logits.shape[-1], dtype=dtype)
        probs = jnp.exp(logp)
        c = logits.shape[-1]
        fg = jnp.reshape(onehot, (-1, c)).T                   # [C, P]
        pr = jnp.reshape(probs, (-1, c)).T
        errors = jnp.abs(fg - pr)
        if ignore_index is not None:
            valid = (targets != ignore_index).astype(dtype).reshape(1, -1)
            fg = fg * valid
            errors = errors * valid
        h_n, h_f, h_s = _histograms(errors, fg, interpret)
        h_n, h_f, h_s = jax.lax.psum((h_n, h_f, h_s), axes)
        coef, value = _coefficients(h_n, h_f, h_s)
        w = _lookup(errors, coef, interpret)                  # [C, P]
        wt = w * jnp.sign(pr - fg)
        if ignore_index is not None:
            wt = wt * valid
        wt_img = jnp.reshape(wt.T, probs.shape)               # [B,H,W,C]
        wp = wt_img * probs
        grad = wp - probs * jnp.sum(wp, axis=-1, keepdims=True)
        return value, grad.astype(dtype)

    sm = jax.shard_map(
        region, mesh=mesh, in_specs=(spec_x, spec_y),
        out_specs=(P(), spec_x), check_vma=False,
    )

    @jax.custom_vjp
    def op(logits, targets_f):
        v, _ = sm(logits, targets_f)
        return v

    def fwd(logits, targets_f):
        v, grad = sm(logits, targets_f)
        return v, (grad, jnp.zeros_like(targets_f))

    def bwd(res, g):
        grad, zeros_t = res
        return g * grad, zeros_t

    op.defvjp(fwd, bwd)

    def fn(logits, targets):
        return op(logits, targets.astype(jnp.float32))

    return fn
