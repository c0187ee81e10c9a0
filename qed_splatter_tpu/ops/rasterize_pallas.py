"""Pallas TPU kernels for tile compositing — forward + analytic backward.

The hot path of the per-iteration solve (SURVEY D5; BASELINE.json north
star "Pallas tile-based rasterizer ... and the analytic backward pass").
Replaces the XLA compositing in ops.rasterize for the [T, K] -> image stage:

- **forward**: one grid instance per 16x16 tile; all K depth-ordered
  gaussians' alphas for all 256 pixels evaluated in VMEM (direct
  per-pixel sigma — an MXU quadratic-form variant was reverted, see
  _alphas), exclusive transmittance via a log-space triangular-matmul
  cumulative sum (MXU — cumprod has no TPU lowering and a serial scan
  would waste the MXU), weighted color reduction as a [D, K] x [K, P]
  MXU matmul.
- **backward**: custom VJP with gsplat-equivalent analytic gradients,
  recomputing alphas in-kernel instead of saving [T, P, K] residuals
  (the XLA-autodiff version's ~1 GB-per-tensor HBM traffic): the
  transmittance chain rule needs a triangular-matmul suffix sum only;
  ALL [P, K] -> [K] parameter-gradient reductions (means, conics,
  opacity) come from 6 pixel moments of dsigma = one [8, P] x [P, K]
  MXU matmul (see _bwd_tile_body).

Memory layout: all per-tile arrays are **channel-major** — [T, C, K] with
the K (gaussian) axis last — so VMEM blocks are lane-aligned (K multiple of
128). A [T, K, C] layout pads each C in {1..4} to 128 lanes (measured 128x
VMEM waste, OOM at 4k tiles).

The kernels consume *pre-gathered* per-tile arrays (built by an XLA gather
from ops.tiles lists) so gradients to per-gaussian parameters flow through
the gather's scatter-add transpose automatically — which also yields the
per-tile means2d gradients whose absolute values are the absgrad
densification signal (reference model.py:284).

Alpha semantics match ops.rasterize exactly: mask = (sigma >= 0) &
(alpha > 1/255), clamp at 0.999 with zero gradient beyond the clamp.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qed_splatter_tpu.ops.rasterize import ALPHA_EPS, ALPHA_MAX


def _tri_strict_lower(k: int, dtype=jnp.float32):
    """[K, K] matrix M with M[i, j] = 1 iff i < j (strictly)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    return (rows < cols).astype(dtype)


def _prec(op_dtype):
    """MXU pass count for the kernels' *two-inexact-operand* dots. The TPU
    MXU multiplies bf16 natively; a DEFAULT-precision f32 dot silently
    truncates operands to ONE bf16 pass — measured on-chip as a 4e-3
    render / 1.5e-3 alpha divergence vs the (VPU-elementwise, truly f32)
    XLA oracle (outputs/tpu_parity_r4.log, first run). Mosaic lowers only
    DEFAULT and HIGHEST (HIGH raises NotImplementedError), so the f32 path
    requests HIGHEST here; these dots contract the small D/8 axis, so the
    6 passes are cheap. The FLOPs-dominant dots against *bf16-exact*
    matrices (triangular cumsum, pixel-moment basis) use the 2-pass hi/lo
    split in _dot_exact_rhs instead of 6-pass HIGHEST."""
    return (jax.lax.Precision.HIGHEST if op_dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)


def _dot_exact_mat(x, mat, op_dtype, dims=None, mat_lhs=False):
    """dot with one *bf16-exact* operand ``mat`` (0/1 triangular masks; the
    pixel-moment basis, whose entries are half-integer coordinates and
    their <= 8-significant-bit products) and one inexact operand ``x``.

    f32 path: split x = hi + lo (both bf16) and run TWO DEFAULT-precision
    MXU passes — operand error ~2^-16 relative (vs 2^-8 for one pass),
    on-chip parity equal to 6-pass HIGHEST at a third of the MXU time for
    the FLOPs-dominant K-wide contractions. bf16 path: one pass.
    ``mat_lhs=True`` computes dot(mat, x) instead (dims then index
    (mat, x)), so callers can pick the output layout without an in-kernel
    transpose.
    """
    mat_b = mat.astype(jnp.bfloat16)

    def dot(a):
        ops = (mat_b, a) if mat_lhs else (a, mat_b)
        dn = dims if dims is not None else (
            ((ops[0].ndim - 1,), (0,)), ((), ())
        )
        return jax.lax.dot_general(*ops, dimension_numbers=dn,
                                   preferred_element_type=jnp.float32)

    if op_dtype != jnp.float32:
        return dot(x.astype(op_dtype))
    x_hi = x.astype(jnp.bfloat16)
    x_lo = (x - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return dot(x_hi) + dot(x_lo)


_CUM_BLOCK = 128


def _excl_cumsum_last(x, op_dtype=jnp.float32):
    """Exclusive cumulative sum along the last (K) axis.

    Hierarchical: strictly-triangular MXU matmuls within 128-wide blocks
    plus scalar block offsets — K/128x fewer FLOPs than one [K, K] matmul
    (cumsum/cumprod have no efficient Pallas TPU lowering).

    ``op_dtype=bfloat16`` rounds the matmul *operand* only (the triangular
    matrix is exact 0/1 in bf16, accumulation stays f32), so the error on a
    prefix sum is bounded by 0.4% of the sum of |terms| — the
    mixed-precision mode's transmittance path (see composite_tiles_pallas).
    """
    k = x.shape[-1]
    if k <= _CUM_BLOCK:
        return _dot_exact_mat(x, _tri_strict_lower(k), op_dtype)
    assert k % _CUM_BLOCK == 0
    tri = _tri_strict_lower(_CUM_BLOCK)
    parts = []
    offset = jnp.zeros(x.shape[:-1] + (1,), jnp.float32)
    for b in range(k // _CUM_BLOCK):
        blk = x[..., b * _CUM_BLOCK:(b + 1) * _CUM_BLOCK]
        parts.append(_dot_exact_mat(blk, tri, op_dtype) + offset)
        offset = offset + jnp.sum(blk, axis=-1, keepdims=True)
    return jnp.concatenate(parts, axis=-1)


def _excl_cumprod(one_minus, op_dtype=jnp.float32):
    """Exclusive cumulative product along the last (K) axis, in log space.

    Safe: alpha <= 0.999 keeps log(1 - alpha) >= log(1e-3)."""
    logs = jnp.log(jnp.maximum(one_minus, 1e-6))
    return jnp.exp(_excl_cumsum_last(logs, op_dtype))


def _excl_suffix_sum(x, op_dtype=jnp.float32):
    """R[:, k] = sum_{j > k} x[:, j] = total - inclusive prefix."""
    total = jnp.sum(x, axis=-1, keepdims=True)
    return total - (_excl_cumsum_last(x, op_dtype) + x)


def _pixel_basis(tile_size: int, p: int):
    """[P, 8] compile-time-constant quadratic basis in tile-LOCAL pixel
    coordinates px' = u + 0.5 - ts/2 (u = pixel column in tile): columns
    [1, px', py', px'^2, px'*py', py'^2, 0, 0] (padded to 8 sublanes).

    Local coordinates are the precision trick that makes the MXU
    formulation safe: |px'| <= 7.5, so no term in the expanded quadratic
    carries the ~1e6-magnitude global-pixel squares whose f32 cancellation
    would corrupt sigma."""
    pix = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    half = tile_size * 0.5
    px = (pix % tile_size).astype(jnp.float32) + (0.5 - half)
    py = (pix // tile_size).astype(jnp.float32) + (0.5 - half)
    one = jnp.ones((p, 1), jnp.float32)
    zero = jnp.zeros((p, 1), jnp.float32)
    return jnp.concatenate(
        [one, px, py, px * px, px * py, py * py, zero, zero], axis=1
    )


def _alphas(means_ref, conics_ref, opac_ref, tile_idx, num_tiles_x,
            tile_size, p, j=0):
    """Recompute alpha [P, K] + masks from channel-major per-tile blocks.

    ``j`` is the local tile index within the (tb-tile) block.

    sigma is evaluated DIRECTLY per pixel (dx = mx - px), in tile-local
    coordinates. An MXU formulation (sigma is quadratic in pixel coords,
    so the field is basis[P, 8] @ coef[8, K]) was tried and reverted for
    the forward: anisotropic needle splats crossing a tile make the
    expanded coefficients (0.5*ca*mxl^2 + cb*mxl*myl + 0.5*cc*myl^2,
    each ~1e4) cancel catastrophically to sigma ~ 0, and near-saturated
    alphas amplify the ~1e-4 sigma error through 1/(1 - alpha) into
    ~7e-2 pixel outliers vs the oracle (measured; direct form keeps the
    full-render max diff at ~1e-3). The backward's moment-matmul
    reduction (see _bwd_tile_body) is unaffected — it is an exact
    rewrite of the gradient sums, not of sigma.

    Returns the [1, K] tile-local mean/conic rows for that reduction."""
    ox = ((tile_idx % num_tiles_x) * tile_size).astype(jnp.float32)
    oy = ((tile_idx // num_tiles_x) * tile_size).astype(jnp.float32)
    half = tile_size * 0.5
    pix = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    pxl = (pix % tile_size).astype(jnp.float32) + (0.5 - half)  # [P, 1]
    pyl = (pix // tile_size).astype(jnp.float32) + (0.5 - half)
    mxl = means_ref[j, 0, :][None, :] - (ox + half)   # [1, K] local
    myl = means_ref[j, 1, :][None, :] - (oy + half)
    ca = conics_ref[j, 0, :][None, :]
    cb = conics_ref[j, 1, :][None, :]
    cc = conics_ref[j, 2, :][None, :]
    op = opac_ref[j, 0, :][None, :]
    dx = mxl - pxl                                    # [P, K]
    dy = myl - pyl
    sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
    a_raw = op * jnp.exp(-sigma)
    mask = (sigma >= 0.0) & (a_raw > ALPHA_EPS)
    alpha = jnp.where(mask, jnp.minimum(a_raw, ALPHA_MAX), 0.0)
    return alpha, a_raw, mask, sigma, (mxl, myl, ca, cb, cc)


# Early-termination threshold: a tile whose every pixel's remaining
# transmittance is below this contributes < EARLY_STOP_EPS to any channel —
# the gsplat rasterizer stops compositing at the same per-pixel threshold
# (and replays only processed splats in backward), so skipping such chunks
# preserves reference semantics.
EARLY_STOP_EPS = 1e-4


def _fwd_tile_body(means_ref, conics_ref, colors_ref, opac_ref,
                   out_ref, acc_ref, t, j, num_tiles_x, tile_size, p,
                   op_dtype):
    alpha, _, _, _, _ = _alphas(
        means_ref, conics_ref, opac_ref, t, num_tiles_x, tile_size, p, j
    )  # [P, K]
    t_excl = _excl_cumprod(1.0 - alpha, op_dtype)
    w = alpha * t_excl                     # [P, K]
    # out[D, P] = colors[D, K] . w[P, K]^T  (contract K)
    out_ref[j] = jax.lax.dot_general(
        colors_ref[j].astype(op_dtype), w.astype(op_dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_prec(op_dtype),
    )
    acc_ref[j] = jnp.sum(w, axis=-1)[None, :]


def _fwd_kernel(means_ref, conics_ref, colors_ref, opac_ref,
                out_ref, acc_ref, *, num_tiles_x, tile_size, p, tb,
                op_dtype=jnp.float32):
    base = pl.program_id(0) * tb
    for j in range(tb):  # static unroll: tb tiles per grid instance
        _fwd_tile_body(means_ref, conics_ref, colors_ref, opac_ref,
                       out_ref, acc_ref, base + j, j,
                       num_tiles_x, tile_size, p, op_dtype)


def _fwd_kernel_skip(counts_ref, means_ref, conics_ref, colors_ref,
                     opac_ref, accp_ref, out_ref, acc_ref, *,
                     num_tiles_x, tile_size, p, tb, chunk_start,
                     op_dtype=jnp.float32):
    """Forward with per-tile early termination. A tile skips this depth
    chunk's matmuls when EITHER its pixels are all saturated (``accp_ref``,
    the alpha accumulated by earlier chunks) OR its uncapped intersection
    count (scalar-prefetched ``counts_ref``) shows the chunk holds only
    padding."""
    base = pl.program_id(0) * tb
    for j in range(tb):
        live = (
            jnp.max(1.0 - accp_ref[j, 0, :]) >= EARLY_STOP_EPS
        ) & (counts_ref[base + j] > chunk_start)

        @pl.when(live)
        def _():
            _fwd_tile_body(means_ref, conics_ref, colors_ref, opac_ref,
                           out_ref, acc_ref, base + j, j,
                           num_tiles_x, tile_size, p, op_dtype)

        @pl.when(jnp.logical_not(live))
        def _():
            out_ref[j] = jnp.zeros(out_ref.shape[1:], jnp.float32)
            acc_ref[j] = jnp.zeros(acc_ref.shape[1:], jnp.float32)


def _bwd_kernel_skip(counts_ref, means_ref, conics_ref, colors_ref,
                     opac_ref, accp_ref, gout_ref, gacc_ref,
                     dmeans_ref, dconics_ref, dcolors_ref, dopac_ref,
                     *, num_tiles_x, tile_size, p, tb, chunk_start,
                     op_dtype=jnp.float32):
    """Backward with the forward's early-termination predicate: a chunk the
    forward skipped contributed (exact) zeros, so its gradients are zero —
    the same splats gsplat's backward replay never touches."""
    base = pl.program_id(0) * tb
    for j in range(tb):
        live = (
            jnp.max(1.0 - accp_ref[j, 0, :]) >= EARLY_STOP_EPS
        ) & (counts_ref[base + j] > chunk_start)

        @pl.when(live)
        def _():
            _bwd_tile_body(means_ref, conics_ref, colors_ref, opac_ref,
                           gout_ref, gacc_ref, dmeans_ref, dconics_ref,
                           dcolors_ref, dopac_ref, base + j, j,
                           num_tiles_x, tile_size, p, op_dtype)

        @pl.when(jnp.logical_not(live))
        def _():
            dmeans_ref[j] = jnp.zeros(dmeans_ref.shape[1:], jnp.float32)
            dconics_ref[j] = jnp.zeros(dconics_ref.shape[1:], jnp.float32)
            dcolors_ref[j] = jnp.zeros(dcolors_ref.shape[1:], jnp.float32)
            dopac_ref[j] = jnp.zeros(dopac_ref.shape[1:], jnp.float32)


def _bwd_kernel(means_ref, conics_ref, colors_ref, opac_ref,
                gout_ref, gacc_ref,
                dmeans_ref, dconics_ref, dcolors_ref, dopac_ref,
                *, num_tiles_x, tile_size, p, tb, op_dtype=jnp.float32):
    base = pl.program_id(0) * tb
    for j in range(tb):  # static unroll: tb tiles per grid instance
        _bwd_tile_body(means_ref, conics_ref, colors_ref, opac_ref,
                       gout_ref, gacc_ref, dmeans_ref, dconics_ref,
                       dcolors_ref, dopac_ref, base + j, j,
                       num_tiles_x, tile_size, p, op_dtype)


def _bwd_tile_body(means_ref, conics_ref, colors_ref, opac_ref,
               gout_ref, gacc_ref,
               dmeans_ref, dconics_ref, dcolors_ref, dopac_ref,
               t, j, num_tiles_x, tile_size, p, op_dtype):
    alpha, a_raw, mask, sigma, (mxl, myl, ca, cb, cc) = _alphas(
        means_ref, conics_ref, opac_ref, t, num_tiles_x, tile_size, p, j
    )
    t_excl = _excl_cumprod(1.0 - alpha, op_dtype)
    w = alpha * t_excl                     # [P, K]
    gout = gout_ref[j]                     # [D, P]
    gacc = gacc_ref[j, 0, :]               # [P]

    # dL/dw[P, K] = gout[D, P] . colors[D, K] (contract D) + gacc
    dw = jax.lax.dot_general(
        gout.astype(op_dtype), colors_ref[j].astype(op_dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_prec(op_dtype),
    ) + gacc[:, None]
    # dL/dcolors[D, K] = gout[D, P] . w[P, K]
    dcolors_ref[j] = jnp.dot(
        gout.astype(op_dtype), w.astype(op_dtype),
        preferred_element_type=jnp.float32, precision=_prec(op_dtype),
    )

    # transmittance chain: dL/da_k = T_k dw_k - R_k / (1 - a_k)
    # with R_k = sum_{j>k} w_j dw_j
    wdw = w * dw
    R = _excl_suffix_sum(wdw, op_dtype)
    dalpha = t_excl * dw - R / (1.0 - alpha)
    # clamp + mask: gradient only where alpha = a_raw (not clamped)
    live = mask & (a_raw <= ALPHA_MAX)
    da_raw = jnp.where(live, dalpha, 0.0)
    dsigma = -a_raw * da_raw               # [P, K]

    # All [P, K] -> [K] gradient reductions through 6 pixel moments of
    # dsigma — ONE MXU matmul (basis^T[8, P] @ dsigma[P, K]) replaces the
    # dx/dy fields, ~20 elementwise [P, K] ops, and five separate VPU
    # reductions of the direct formulation. In tile-local coordinates
    # (dxl = mxl - px'):
    #   dmx   = sum dsigma*(ca*dxl + cb*dyl)  -> ca*(mxl*S0 - Sx) + ...
    #   dca   = sum 0.5*dxl^2*dsigma          -> 0.5*(mxl^2*S0 - 2*mxl*Sx + Sxx)
    #   dopac = sum (a_raw/op)*da_raw = -S0/op  (a_raw*da_raw = -dsigma)
    m = _dot_exact_mat(
        dsigma, _pixel_basis(tile_size, p), op_dtype, mat_lhs=True,
        dims=(((0,), (0,)), ((), ())),
    )  # [8, K] pixel moments of dsigma                                      # [8, K]
    s0, sx, sy = m[0:1], m[1:2], m[2:3]    # [1, K] each
    sxx, sxy, syy = m[3:4], m[4:5], m[5:6]
    gx = mxl * s0 - sx                     # sum dxl*dsigma
    gy = myl * s0 - sy
    dmx = ca * gx + cb * gy
    dmy = cc * gy + cb * gx
    dmeans_ref[j] = jnp.concatenate([dmx, dmy], axis=0)   # [2, K]
    d_ca = 0.5 * (mxl * mxl * s0 - 2.0 * mxl * sx + sxx)
    d_cb = mxl * myl * s0 - mxl * sy - myl * sx + sxy
    d_cc = 0.5 * (myl * myl * s0 - 2.0 * myl * sy + syy)
    dconics_ref[j] = jnp.concatenate([d_ca, d_cb, d_cc], axis=0)  # [3, K]
    op = opac_ref[j, 0, :][None, :]
    dopac_ref[j] = jnp.where(op > 0, -s0 / jnp.maximum(op, 1e-12), 0.0)


def _block(c, k, tb=1):
    """Channel-major [T, C, K] block: lanes = K (128-aligned), sublanes = C.
    ``tb`` tiles per grid instance amortize per-instance overhead."""
    return pl.BlockSpec((tb, c, k), lambda t, *_: (t, 0, 0),
                        memory_space=pltpu.VMEM)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7)
)
def composite_tiles_pallas(
    g_means: jnp.ndarray,    # [T, 2, K] gathered screen means (channel-major)
    g_conics: jnp.ndarray,   # [T, 3, K]
    g_colors: jnp.ndarray,   # [T, D, K]
    g_opac: jnp.ndarray,     # [T, 1, K] (0 for padded slots)
    num_tiles_x: int,
    tile_size: int = 16,
    interpret: Optional[bool] = None,
    mixed_precision: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Composite gathered per-tile gaussians -> ([T, D, P], [T, 1, P]).

    ``mixed_precision=True`` (reference TrainerConfig mixed_precision,
    config.py:32) rounds the MXU matmul *operands* to bf16 — the
    transmittance log-cumsum, the color compositing contraction and the
    backward dw/dcolors contractions — with f32 accumulation throughout.
    Alpha evaluation, masks and all VPU elementwise math stay f32 (bf16
    comparisons also crash Mosaic). Error bound: ~0.4% of |log T| on
    transmittance, 0.4% relative on composited color."""
    return _composite_fwd_impl(
        g_means, g_conics, g_colors, g_opac, num_tiles_x, tile_size,
        interpret, mixed_precision
    )


def _interpret_default(interpret):
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


TILES_PER_INSTANCE = 8


def _tiles_per_instance(k: int, t: int) -> int:
    """Tiles per grid instance, scaled down as K grows so the per-instance
    VMEM working set (a few [P, K] f32 intermediates per unrolled tile)
    stays roughly constant (~the K=512 x 8-tile budget that is known to
    fit)."""
    return max(1, min(TILES_PER_INSTANCE,
                      (512 * TILES_PER_INSTANCE) // max(k, 1), t))


def _pad_tiles(arrs, t, tb):
    pad = (-t) % tb
    if pad == 0:
        return arrs, t
    return [jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
            for a in arrs], t + pad


def _composite_fwd_impl(g_means, g_conics, g_colors, g_opac,
                        num_tiles_x, tile_size, interpret,
                        mixed_precision=False):
    t, d, k = g_colors.shape
    p = tile_size * tile_size
    tb = _tiles_per_instance(k, t)
    (g_means, g_conics, g_colors, g_opac), tp = _pad_tiles(
        [g_means, g_conics, g_colors, g_opac], t, tb
    )
    kern = functools.partial(
        _fwd_kernel, num_tiles_x=num_tiles_x, tile_size=tile_size, p=p,
        tb=tb,
        op_dtype=jnp.bfloat16 if mixed_precision else jnp.float32,
    )
    flops_tile = p * k * (20 + 2 * k + 2 * d)
    out, acc = pl.pallas_call(
        kern,
        grid=(tp // tb,),
        in_specs=[_block(2, k, tb), _block(3, k, tb), _block(d, k, tb),
                  _block(1, k, tb)],
        out_specs=(_block(d, p, tb), _block(1, p, tb)),
        out_shape=(
            jax.ShapeDtypeStruct((tp, d, p), jnp.float32),
            jax.ShapeDtypeStruct((tp, 1, p), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=t * flops_tile,
            bytes_accessed=t * k * 4 * (2 + 3 + d + 1) + t * p * 4 * (d + 1),
            transcendentals=t * p * k * 2,
        ),
        interpret=_interpret_default(interpret),
    )(g_means, g_conics, g_colors, g_opac)
    return out[:t], acc[:t]


def _composite_fwd(g_means, g_conics, g_colors, g_opac,
                   num_tiles_x, tile_size, interpret, mixed_precision):
    out = _composite_fwd_impl(
        g_means, g_conics, g_colors, g_opac, num_tiles_x, tile_size,
        interpret, mixed_precision
    )
    return out, (g_means, g_conics, g_colors, g_opac)


def _composite_bwd(num_tiles_x, tile_size, interpret, mixed_precision, res,
                   grads):
    g_means, g_conics, g_colors, g_opac = res
    gout, gacc = grads
    t, d, k = g_colors.shape
    p = tile_size * tile_size
    tb = _tiles_per_instance(k, t)
    (g_means, g_conics, g_colors, g_opac, gout, gacc), tp = _pad_tiles(
        [g_means, g_conics, g_colors, g_opac, gout, gacc], t, tb
    )
    kern = functools.partial(
        _bwd_kernel, num_tiles_x=num_tiles_x, tile_size=tile_size, p=p,
        tb=tb,
        op_dtype=jnp.bfloat16 if mixed_precision else jnp.float32,
    )
    flops_tile = p * k * (40 + 4 * k + 4 * d)
    dmeans, dconics, dcolors, dopac = pl.pallas_call(
        kern,
        grid=(tp // tb,),
        in_specs=[
            _block(2, k, tb), _block(3, k, tb), _block(d, k, tb),
            _block(1, k, tb),
            _block(d, p, tb), _block(1, p, tb),
        ],
        out_specs=(
            _block(2, k, tb), _block(3, k, tb), _block(d, k, tb),
            _block(1, k, tb),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((tp, 2, k), jnp.float32),
            jax.ShapeDtypeStruct((tp, 3, k), jnp.float32),
            jax.ShapeDtypeStruct((tp, d, k), jnp.float32),
            jax.ShapeDtypeStruct((tp, 1, k), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=t * flops_tile,
            bytes_accessed=t * k * 4 * 2 * (2 + 3 + d + 1)
            + t * p * 4 * (d + 1),
            transcendentals=t * p * k * 2,
        ),
        interpret=_interpret_default(interpret),
    )(g_means, g_conics, g_colors, g_opac, gout, gacc)
    # cotangent dtypes must match the primals (bf16 color slabs under
    # mixed precision); the kernel accumulates f32 and re-rounds here
    return (dmeans[:t], dconics[:t],
            dcolors[:t].astype(res[2].dtype), dopac[:t])


composite_tiles_pallas.defvjp(_composite_fwd, _composite_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def composite_tiles_pallas_skip(
    g_means: jnp.ndarray,    # [T, 2, K]
    g_conics: jnp.ndarray,   # [T, 3, K]
    g_colors: jnp.ndarray,   # [T, D, K]
    g_opac: jnp.ndarray,     # [T, 1, K]
    acc_prev: jnp.ndarray,   # [T, 1, P] alpha accumulated by earlier chunks
    counts: jnp.ndarray,     # [T] int32 uncapped per-tile intersections
    num_tiles_x: int,
    chunk_start: int = 0,    # this chunk covers depth ranks >= chunk_start
    tile_size: int = 16,
    interpret: Optional[bool] = None,
    mixed_precision: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``composite_tiles_pallas`` with per-tile early termination.

    Used for the 2nd+ depth chunks of ``composite_tiles_chunked``: a tile
    whose pixels are all saturated (remaining transmittance <
    EARLY_STOP_EPS) skips both the forward matmuls and — via the same
    predicate — the backward (its contribution and gradients are < eps,
    exactly the splats gsplat's early-terminating rasterizer never
    processes). ``acc_prev`` only gates the skip; its cotangent is zero.
    """
    return _composite_skip_fwd_impl(
        g_means, g_conics, g_colors, g_opac, acc_prev, counts, num_tiles_x,
        chunk_start, tile_size, interpret, mixed_precision
    )


def _pad_counts(counts, tp):
    pad = tp - counts.shape[0]
    if pad == 0:
        return counts.astype(jnp.int32)
    return jnp.pad(counts.astype(jnp.int32), (0, pad))  # padding skips


def _composite_skip_fwd_impl(g_means, g_conics, g_colors, g_opac, acc_prev,
                             counts, num_tiles_x, chunk_start, tile_size,
                             interpret, mixed_precision=False):
    t, d, k = g_colors.shape
    p = tile_size * tile_size
    tb = _tiles_per_instance(k, t)
    (g_means, g_conics, g_colors, g_opac, acc_prev), tp = _pad_tiles(
        [g_means, g_conics, g_colors, g_opac, acc_prev], t, tb
    )
    kern = functools.partial(
        _fwd_kernel_skip, num_tiles_x=num_tiles_x, tile_size=tile_size,
        p=p, tb=tb, chunk_start=chunk_start,
        op_dtype=jnp.bfloat16 if mixed_precision else jnp.float32,
    )
    flops_tile = p * k * (20 + 2 * k + 2 * d)
    out, acc = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(tp // tb,),
            in_specs=[_block(2, k, tb), _block(3, k, tb), _block(d, k, tb),
                      _block(1, k, tb), _block(1, p, tb)],
            out_specs=(_block(d, p, tb), _block(1, p, tb)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((tp, d, p), jnp.float32),
            jax.ShapeDtypeStruct((tp, 1, p), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=t * flops_tile,
            bytes_accessed=t * k * 4 * (2 + 3 + d + 1) + t * p * 4 * (d + 2),
            transcendentals=t * p * k * 2,
        ),
        interpret=_interpret_default(interpret),
    )(_pad_counts(counts, tp), g_means, g_conics, g_colors, g_opac, acc_prev)
    return out[:t], acc[:t]


def _composite_skip_fwd(g_means, g_conics, g_colors, g_opac, acc_prev,
                        counts, num_tiles_x, chunk_start, tile_size,
                        interpret, mixed_precision):
    out = _composite_skip_fwd_impl(
        g_means, g_conics, g_colors, g_opac, acc_prev, counts, num_tiles_x,
        chunk_start, tile_size, interpret, mixed_precision
    )
    return out, (g_means, g_conics, g_colors, g_opac, acc_prev, counts)


def _composite_skip_bwd(num_tiles_x, chunk_start, tile_size, interpret,
                        mixed_precision, res, grads):
    g_means, g_conics, g_colors, g_opac, acc_prev, counts = res
    gout, gacc = grads
    t, d, k = g_colors.shape
    p = tile_size * tile_size
    tb = _tiles_per_instance(k, t)
    (g_means, g_conics, g_colors, g_opac, acc_prev, gout, gacc), tp = (
        _pad_tiles(
            [g_means, g_conics, g_colors, g_opac, acc_prev, gout, gacc],
            t, tb,
        )
    )
    kern = functools.partial(
        _bwd_kernel_skip, num_tiles_x=num_tiles_x, tile_size=tile_size,
        p=p, tb=tb, chunk_start=chunk_start,
        op_dtype=jnp.bfloat16 if mixed_precision else jnp.float32,
    )
    flops_tile = p * k * (40 + 4 * k + 4 * d)
    dmeans, dconics, dcolors, dopac = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(tp // tb,),
            in_specs=[
                _block(2, k, tb), _block(3, k, tb), _block(d, k, tb),
                _block(1, k, tb), _block(1, p, tb),
                _block(d, p, tb), _block(1, p, tb),
            ],
            out_specs=(
                _block(2, k, tb), _block(3, k, tb), _block(d, k, tb),
                _block(1, k, tb),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((tp, 2, k), jnp.float32),
            jax.ShapeDtypeStruct((tp, 3, k), jnp.float32),
            jax.ShapeDtypeStruct((tp, d, k), jnp.float32),
            jax.ShapeDtypeStruct((tp, 1, k), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=t * flops_tile,
            bytes_accessed=t * k * 4 * 2 * (2 + 3 + d + 1)
            + t * p * 4 * (d + 2),
            transcendentals=t * p * k * 2,
        ),
        interpret=_interpret_default(interpret),
    )(_pad_counts(counts, tp), g_means, g_conics, g_colors, g_opac,
      acc_prev, gout, gacc)
    # acc_prev/counts only gate the (measure-zero) skip predicate: zero
    # cotangents. Color cotangents re-round to the (possibly bf16) primal.
    return (dmeans[:t], dconics[:t], dcolors[:t].astype(res[2].dtype),
            dopac[:t], jnp.zeros_like(acc_prev[:t]),
            jnp.zeros_like(counts))


composite_tiles_pallas_skip.defvjp(_composite_skip_fwd, _composite_skip_bwd)


# Largest K handed to a single pallas_call. Over-compositing is associative
# in (color, accumulated alpha): for a front-to-back split A|B of the depth-
# sorted per-tile lists, out = out_A + (1-acc_A)*out_B and
# acc = acc_A + (1-acc_A)*acc_B — exact, not an approximation. Chunking
# bounds the custom-call operand+result bytes: XLA:TPU scope-allocates
# small pallas operands/results in VMEM (16 MB scoped limit), and at
# adaptive K>=2048 with few tiles (low-res phase of the schedule) the
# unchunked call exceeds it (observed: 18.5 MB at K=2048, 78 tiles —
# compile-time "ran out of memory in memory space vmem"). 1024 keeps the
# worst per-call footprint ~7 MB while staying MXU-efficient.
K_CHUNK = 1024


def composite_tiles_chunked(g_means, g_conics, g_colors, g_opac,
                            num_tiles_x, tile_size, interpret,
                            mixed_precision, tile_counts=None):
    """composite_tiles_pallas over depth-ordered K chunks of <= K_CHUNK.

    Chunks after the first early-terminate per tile on saturation (the
    accumulated alpha) and, when ``tile_counts`` (uncapped per-tile
    intersection counts from the binning) is given, on the chunk holding
    only padding — most tiles sit far below the adaptive K cap."""
    k = g_colors.shape[-1]
    if k <= K_CHUNK:
        return composite_tiles_pallas(
            g_means, g_conics, g_colors, g_opac, num_tiles_x, tile_size,
            interpret, mixed_precision,
        )
    if tile_counts is None:
        tile_counts = jnp.full((g_colors.shape[0],), k, jnp.int32)
    out = None
    acc = None
    for s in range(0, k, K_CHUNK):
        e = min(s + K_CHUNK, k)
        parts = (g_means[..., s:e], g_conics[..., s:e], g_colors[..., s:e],
                 g_opac[..., s:e])
        if out is None:
            # first chunk stays on the PLAIN kernel: routing it through the
            # skip kernel (count-gated, chunk_start=0) was measured 5x
            # slower on the dense bench row (5.20 -> 1.05 it/s at K=1024)
            # — the scalar-prefetch/predicated variant carries a large
            # per-tile overhead when nothing skips. See chunk 2+ below for
            # where skipping pays.
            out, acc = composite_tiles_pallas(
                *parts, num_tiles_x, tile_size, interpret, mixed_precision,
            )
        else:
            # later chunks carry the accumulated alpha so saturated tiles
            # early-terminate (gsplat's T < 1e-4 stop, exact to eps)
            o, a = composite_tiles_pallas_skip(
                *parts, jax.lax.stop_gradient(acc),
                jax.lax.stop_gradient(tile_counts), num_tiles_x, s,
                tile_size, interpret, mixed_precision,
            )
            trans = 1.0 - acc          # [T, 1, P]
            out = out + trans * o
            acc = acc + trans * a
    return out, acc


def rasterize_tiles_pallas(
    tile_lists: jnp.ndarray,   # [T, K] from bin_gaussians
    means2d: jnp.ndarray,      # [N, 2]
    conics: jnp.ndarray,       # [N, 3]
    colors: jnp.ndarray,       # [N, D]
    opacities: jnp.ndarray,    # [N]
    width: int,
    height: int,
    num_tiles_x: int,
    tile_size: int = 16,
    tile_eps: Optional[jnp.ndarray] = None,
    interpret: Optional[bool] = None,
    slab_perm: Optional[jnp.ndarray] = None,
    slab_bounds: Optional[jnp.ndarray] = None,
    tile_ranks: Optional[jnp.ndarray] = None,
    order: Optional[jnp.ndarray] = None,
    inv_order: Optional[jnp.ndarray] = None,
    absgrad_seed: Optional[jnp.ndarray] = None,
    mixed_precision: bool = False,
    tile_counts: Optional[jnp.ndarray] = None,
):
    """Drop-in replacement for ops.rasterize.rasterize_tiles using the
    Pallas kernels. The per-tile gather stays in XLA so parameter gradients
    and the absgrad tile_eps side-channel work unchanged. When the binning
    supplies rank-space addressing (tile_ranks/order/inv_order) plus the
    slab grouping plan, both the gather and its VJP reduction avoid
    scatters and the [T, K] rank->id decode entirely; otherwise gaussian-id
    ``tile_lists`` with a scatter-add VJP serve as the fallback."""
    from qed_splatter_tpu.ops.rasterize import RasterizeResult

    if tile_ranks is not None:
        t, k = tile_ranks.shape
    else:
        t, k = tile_lists.shape
    d = colors.shape[-1]
    num_tiles_y = -(-t // num_tiles_x)
    assert num_tiles_x * num_tiles_y == t, "tile grid mismatch"

    # one packed channel-major gather; its custom VJP reduces gradients by
    # grouped segment sum instead of XLA's scalar scatter-add
    from qed_splatter_tpu.ops.segment import (
        tile_gather_cm,
        tile_gather_ranked,
        tile_gather_ranked_sort,
    )

    # NOTE (negative result, round 4): splitting the gather into an f32
    # geometry slab + bf16 color slab under mixed precision — to halve the
    # [T, C, K] HBM bytes — measured SLOWER (54.9 vs 50.5 ms step): the
    # TPU row gather is bound by its 1.1M indices, not bytes, so a second
    # gather doubles the dominant cost. One packed gather stays.
    packed = jnp.concatenate(
        [means2d, conics, colors, opacities[:, None]], axis=-1
    )  # [N, 6 + D]
    if tile_ranks is not None and slab_perm is not None:
        g = tile_gather_ranked(packed, order, inv_order, tile_ranks,
                               slab_perm, slab_bounds,
                               absgrad_seed=absgrad_seed)
    elif tile_ranks is not None and inv_order is not None:
        # big-slab training path (binning skipped the grouping plan above
        # segment.BIG_SLAB_SLOTS): same forward, sort-reduction VJP
        g = tile_gather_ranked_sort(packed, order, inv_order, tile_ranks,
                                    absgrad_seed=absgrad_seed)
    elif tile_ranks is not None:
        # forward-only rank addressing (eval/export: nothing differentiates
        # through the gather, so no reduction plan is needed)
        from qed_splatter_tpu.ops.segment import _ranked_gather_fwd_impl

        g = _ranked_gather_fwd_impl(packed, order, tile_ranks)
    else:
        g = tile_gather_cm(packed, tile_lists)
    g_means = g[:, 0:2]
    if tile_eps is not None:
        g_means = g_means + tile_eps.transpose(0, 2, 1)
    g_conics = g[:, 2:5]
    g_colors = g[:, 5:5 + d]
    g_opac = g[:, 5 + d:6 + d]

    out, acc = composite_tiles_chunked(
        g_means, g_conics, g_colors, g_opac, num_tiles_x, tile_size,
        interpret, mixed_precision, tile_counts=tile_counts,
    )
    # out: [T, D, P] -> [H, W, D]
    img = out.reshape(num_tiles_y, num_tiles_x, d, tile_size, tile_size)
    img = img.transpose(0, 3, 1, 4, 2).reshape(
        num_tiles_y * tile_size, num_tiles_x * tile_size, d
    )[:height, :width]
    a = acc.reshape(num_tiles_y, num_tiles_x, tile_size, tile_size)
    a = a.transpose(0, 2, 1, 3).reshape(
        num_tiles_y * tile_size, num_tiles_x * tile_size
    )[:height, :width]
    return RasterizeResult(render=img, alpha=a[..., None])
