"""TPU-native tile rasterizer for 3D Gaussian splatting.

Replaces gsplat 0.1.11's CUDA ``rasterize_gaussians`` (tile-based 16x16,
depth-sorted alpha compositing, custom backward) that the reference calls
**four times per camera** — rgb, uncertainty, depth, depth-variance
(`/root/reference/nerfuncertainty/models/activesplatfacto/
activesplatfacto_model.py:14,260-273,286-301,305-319,343-356`).

TPU-first design (SURVEY §2.3, §7 stage 5) — everything static-shape, no
atomics, no per-pixel sorted lists:

  1. one global depth ``argsort`` over the fixed-capacity Gaussian buffer;
  2. per tile, the first ``capacity`` depth-ordered intersecting Gaussians
     are compacted with a cumsum + scatter-drop (differentiable gathers);
  3. compositing is *parallel*, not sequential: alphas form a (K, P) matrix
     (P = tile pixels), transmittance is an exclusive ``cumprod`` along K
     (log-depth scan in XLA), and the blend is a single
     ``weights^T @ payload`` matmul on the MXU with an **arbitrary
     C-channel payload** — rgb+uncertainty+depth+depth^2 composite in one
     launch, collapsing the reference's 4 rasterize calls;
  4. gradients flow through gather/cumprod/matmul via plain autodiff
     (alpha is clamped to 0.999 so 1-alpha never hits 0).

Tiles are processed in vmapped chunks under ``lax.map`` to bound VMEM/HBM
footprint; the tile grid reshapes straight back into the image (tiles are
row-major), so no scatter into the framebuffer is needed.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from uncertainty_nerf_gs_tpu.ops.gaussians import Projection
from uncertainty_nerf_gs_tpu.ops.prefix import cumsum_lanes

TILE = 16
ALPHA_CLAMP = 0.999
ALPHA_MIN = 1.0 / 255.0


class RasterOutputs(NamedTuple):
    image: jax.Array  # (H, W, C) composited payload (no background)
    alpha: jax.Array  # (H, W) accumulated opacity
    max_overflow: jax.Array  # () int32: worst per-tile hit count beyond capacity


def _pad_to_multiple(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.cache
def _strict_lower(k: int) -> np.ndarray:
    """(K, K) strictly-lower-triangular ones: L @ x = exclusive prefix sum
    along K. Host constant (a jnp array cached across traces would leak
    tracers)."""
    return np.tril(np.ones((k, k), np.float32), k=-1)


def composite_tiles_mm(
    packed: jax.Array, pix: jax.Array, tile_chunk: int = 64
) -> tuple[jax.Array, jax.Array]:
    """Batched tile compositing with the transmittance scan on the MXU.

    The sequential-looking part of alpha compositing is the exclusive
    cumprod of (1 - alpha) along the depth-ordered K axis. In log space
    that is an exclusive prefix SUM, i.e. one strictly-lower-triangular
    (K, K) matmul — so the entire composite becomes three MXU contractions
    per tile chunk (prefix, channel blend, and their transposes in the
    autodiff backward) plus elementwise VPU work. Exact semantics (alpha
    clamped at ``ALPHA_CLAMP`` keeps log1p finite), plain autodiff — no
    custom VJP, no sequential K loop, no per-tile early exits needed
    because the MXU eats the full (K, P) block faster than the exit logic
    saved on the VPU (measured vs `rasterize_pallas.composite_tiles`).

    packed: (T, K, 6+C) rows [mu(2), conic(3), opacity, payload(C)] with
    dead slots at opacity 0; pix: (T, P, 2) pixel centers.
    Returns ((T, P, C) images, (T, P) alphas).
    """
    t, k, d = packed.shape
    c = d - 6
    # small images (training renders) have fewer tiles than the chunk —
    # don't pad 16 tiles up to 64 and composite 4x dead work
    tile_chunk = min(tile_chunk, _pad_to_multiple(t, 8))
    lower = _strict_lower(k)

    def chunk_fn(args):
        pk, px = args  # (B, K, D), (B, P, 2)
        dx = px[:, None, :, 0] - pk[:, :, None, 0]  # (B, K, P)
        dy = px[:, None, :, 1] - pk[:, :, None, 1]
        ca, cb, cc = pk[:, :, None, 2], pk[:, :, None, 3], pk[:, :, None, 4]
        sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
        alpha = jnp.minimum(ALPHA_CLAMP, pk[:, :, None, 5] * jnp.exp(-sigma))
        alpha = jnp.where((sigma >= 0.0) & (alpha >= ALPHA_MIN), alpha, 0.0)
        # exclusive prefix sum over K on the MXU -> transmittance
        log_t = jnp.einsum(
            "kj,bjp->bkp",
            lower,
            jnp.log1p(-alpha),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        w = alpha * jnp.exp(log_t)  # (B, K, P)
        img = jnp.einsum(
            "bkp,bkc->bpc",
            w,
            pk[:, :, 6:],
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        return img, jnp.sum(w, axis=1)

    pad = _pad_to_multiple(t, tile_chunk) - t
    if pad:
        packed = jnp.concatenate([packed, jnp.zeros((pad, k, d))], 0)
        pix = jnp.concatenate([pix, jnp.zeros((pad,) + pix.shape[1:])], 0)
    imgs, alphas = jax.lax.map(
        chunk_fn,
        (
            packed.reshape(-1, tile_chunk, k, d),
            pix.reshape(-1, tile_chunk, *pix.shape[1:]),
        ),
    )
    return imgs.reshape(-1, pix.shape[1], c)[:t], alphas.reshape(
        -1, pix.shape[1]
    )[:t]


class TileCounts(NamedTuple):
    """Exact intersection counts for capacity auto-tuning: per-tile hit
    counts (sizes ``capacity``) and per-tile-ROW hit counts (sizes
    ``row_capacity`` — the two-level cull's first stage)."""

    tile: jax.Array  # (num_ty, num_tx) int32
    row: jax.Array  # (num_ty,) int32


def tile_hit_counts(proj: Projection, width: int, height: int) -> TileCounts:
    """Exact per-tile / per-tile-row intersecting-Gaussian counts.

    Same bbox predicate as the selection passes (``row_select`` /
    ``select_fn``): tile ``t`` on an axis hits iff ``mean + r >= t*TILE``
    and ``mean - r <= (t+1)*TILE`` (ties inclusive). Instead of the O(T*N)
    scan, each Gaussian scatters ±1 corners of its tile rectangle into a
    2-D difference array; a double cumsum yields every tile's count in
    O(N + T). Cheap enough to run as a probe at train start — this is what
    `models/splatfacto.tune_rasterize_capacity` uses to pick overflow-free
    capacities (the reference's gsplat buffers grow dynamically,
    `activesplatfacto_model.py:260-273`, so it never needs this; our
    fixed-capacity design does)."""
    num_tx = _pad_to_multiple(width, TILE) // TILE
    num_ty = _pad_to_multiple(height, TILE) // TILE
    r = proj.radii

    def axis_range(v: jax.Array) -> tuple[jax.Array, jax.Array]:
        # t*T <= v+r  and  (t+1)*T >= v-r  =>  t in [ceil((v-r)/T - 1),
        # floor((v+r)/T)], both ends inclusive on exact ties like the
        # selection's >= / <= comparisons
        t_lo = jnp.ceil((v - r) / TILE - 1.0).astype(jnp.int32)
        t_hi = jnp.floor((v + r) / TILE).astype(jnp.int32)
        return t_lo, t_hi

    x_lo, x_hi = axis_range(proj.means2d[:, 0])
    y_lo, y_hi = axis_range(proj.means2d[:, 1])
    in_y = proj.valid & (y_hi >= 0) & (y_lo <= num_ty - 1)
    live = in_y & (x_hi >= 0) & (x_lo <= num_tx - 1)
    x0 = jnp.clip(x_lo, 0, num_tx - 1)
    x1 = jnp.clip(x_hi, 0, num_tx - 1)
    y0 = jnp.clip(y_lo, 0, num_ty - 1)
    y1 = jnp.clip(y_hi, 0, num_ty - 1)
    one = live.astype(jnp.int32)
    diff = jnp.zeros((num_ty + 1, num_tx + 1), jnp.int32)
    diff = diff.at[y0, x0].add(one)
    diff = diff.at[y0, x1 + 1].add(-one)
    diff = diff.at[y1 + 1, x0].add(-one)
    diff = diff.at[y1 + 1, x1 + 1].add(one)
    tile = jnp.cumsum(jnp.cumsum(diff, axis=0), axis=1)[:num_ty, :num_tx]
    # row-level counts: row_select tests ONLY the y overlap (no x cull), so
    # the row predicate is `valid & y-overlap` regardless of screen x
    one_r = in_y.astype(jnp.int32)
    rdiff = jnp.zeros((num_ty + 1,), jnp.int32)
    rdiff = rdiff.at[y0].add(one_r)
    rdiff = rdiff.at[y1 + 1].add(-one_r)
    row = jnp.cumsum(rdiff)[:num_ty]
    return TileCounts(tile=tile, row=row)


class SelectPack(NamedTuple):
    """Materialized per-tile selection+pack (the pallas/matmul backends'
    input): packed (T_pad, K, 6+C) depth-sorted rows, pix (T_pad, P, 2)
    pixel centers, counts (T_pad,) live rows, overflows (chunks, tile_chunk)
    per-tile dropped-hit counts, num_tiles (un-padded T)."""

    packed: jax.Array
    pix: jax.Array
    counts: jax.Array
    overflows: jax.Array
    num_tiles: int


def _selection(
    proj: Projection,
    opacities: jax.Array,
    payload: jax.Array,
    width: int,
    height: int,
    capacity: int,
    row_capacity: int | None,
) -> dict:
    """Shared selection machinery: depth sort, two-level cull, per-tile
    first-K compaction. Returns closures + padded source arrays consumed
    by both the fused-composite (`select_and_pack`) and xla (`tile_fn`)
    paths."""
    n = proj.means2d.shape[0]
    num_tx = _pad_to_multiple(width, TILE) // TILE
    num_ty = _pad_to_multiple(height, TILE) // TILE
    num_tiles = num_tx * num_ty

    # -- 1. global front-to-back order ---------------------------------
    sort_key = jnp.where(proj.valid, proj.depths, jnp.inf)
    order = jnp.argsort(sort_key)
    means2d = proj.means2d[order]
    conics = proj.conics[order]
    radii = proj.radii[order]
    valid = proj.valid[order]
    opac = opacities[order]
    payl = payload[order]

    # padded row used for empty per-tile slots (index n after gather-pad)
    means2d_p = jnp.concatenate([means2d, jnp.full((1, 2), -1e6)], 0)
    conics_p = jnp.concatenate([conics, jnp.zeros((1, 3))], 0)
    opac_p = jnp.concatenate([opac, jnp.zeros((1,))], 0)
    payl_p = jnp.concatenate([payl, jnp.zeros((1, payload.shape[-1]))], 0)

    # per-tile pixel offsets (static)
    py, px = jnp.meshgrid(
        jnp.arange(TILE, dtype=jnp.float32),
        jnp.arange(TILE, dtype=jnp.float32),
        indexing="ij",
    )
    pix_off = jnp.stack([px.ravel(), py.ravel()], axis=-1) + 0.5  # (P, 2)

    gauss_idx = jnp.arange(n, dtype=jnp.int32)

    def tile_origin(tid: jax.Array):
        ty = tid // num_tx
        tx = tid % num_tx
        return (tx * TILE).astype(jnp.float32), (ty * TILE).astype(jnp.float32)

    # -- 2a. per-ROW candidate selection (two-level culling) ------------
    # Scanning all N Gaussians per tile is O(T*N) and dominates the whole
    # rasterizer; a first pass per tile ROW compacts the (depth-ordered)
    # candidates that vertically overlap the row, so per-tile selection
    # only scans row_cap candidates: O(rows*N + T*row_cap).
    row_cap = int(min(row_capacity or max(4 * capacity, 1024), n))

    def row_select(ry: jax.Array):
        y0 = (ry * TILE).astype(jnp.float32)
        hit = (
            valid
            & (means2d[:, 1] + radii >= y0)
            & (means2d[:, 1] - radii <= y0 + TILE)
        )
        # counting scan over all N Gaussians: MXU-blocked prefix sum (the
        # lane-axis jnp.cumsum here was ~half the rasterizer's runtime)
        pos = cumsum_lanes(hit) - 1
        hits_total = pos[-1] + 1
        slot = jnp.where(hit & (pos < row_cap), pos, row_cap)
        buf = jnp.full((row_cap + 1,), n, dtype=jnp.int32)
        buf = buf.at[slot].set(gauss_idx, mode="drop")[:row_cap]
        return buf, jnp.maximum(hits_total - row_cap, 0)

    row_idx, row_overflow = jax.lax.map(
        row_select, jnp.arange(num_ty, dtype=jnp.int32)
    )  # (num_ty, row_cap), depth order preserved

    # row-local views (num_ty, row_cap, ...); index n maps to the pad row
    row_x = means2d_p[row_idx, 0]
    row_radii = jnp.concatenate([radii, jnp.zeros((1,))])[row_idx]
    row_live = row_idx < n

    def select_fn(tid: jax.Array):
        """First-K depth-ordered intersecting Gaussians of one tile."""
        ry = tid // num_tx
        x0, _ = tile_origin(tid)
        cand = row_idx[ry]  # (row_cap,)
        hit = (
            row_live[ry]
            & (row_x[ry] + row_radii[ry] >= x0)
            & (row_x[ry] - row_radii[ry] <= x0 + TILE)
        )
        pos = cumsum_lanes(hit) - 1
        hits_total = pos[-1] + 1
        slot = jnp.where(hit & (pos < capacity), pos, capacity)
        idx_buf = jnp.full((capacity + 1,), n, dtype=jnp.int32)
        idx_buf = idx_buf.at[slot].set(cand, mode="drop")[:capacity]
        overflow = jnp.maximum(hits_total - capacity, 0) + row_overflow[ry]
        return idx_buf, overflow

    # -- 2c. matmul compaction (pack_via="matmul"): emit the packed tile
    # rows DIRECTLY as a one-hot (capacity, row_cap) MXU matmul against the
    # row-level packed candidates, skipping both the scatter compaction and
    # the (T, K) row gather. Exact: each one-hot row has a single 1.0, and
    # Precision.HIGHEST decomposes f32 operands exactly, so 1.0*v
    # accumulates to exactly v (r5 profile: the scatter-based select was
    # 26 of the 42 ms fwd+bwd at the bench shape).
    packed_src = jnp.concatenate(
        [means2d_p, conics_p, opac_p[:, None], payl_p], axis=1
    )  # (n+1, 6+C)
    row_packed = packed_src[row_idx]  # (num_ty, row_cap, 6+C)
    k_arange = jnp.arange(capacity, dtype=jnp.int32)

    def pack_fn(tid: jax.Array):
        """Packed rows + live count + overflow of one tile (no indices)."""
        ry = tid // num_tx
        x0, _ = tile_origin(tid)
        hit = (
            row_live[ry]
            & (row_x[ry] + row_radii[ry] >= x0)
            & (row_x[ry] - row_radii[ry] <= x0 + TILE)
        )
        pos = cumsum_lanes(hit) - 1
        hits_total = pos[-1] + 1
        pos = jnp.where(hit, pos, -1)
        onehot = jax.lax.stop_gradient(
            (pos[None, :] == k_arange[:, None]).astype(jnp.float32)
        )  # (capacity, row_cap)
        tile_rows = jnp.matmul(
            onehot, row_packed[ry], precision=jax.lax.Precision.HIGHEST
        )  # (capacity, 6+C)
        count = jnp.minimum(hits_total, capacity).astype(jnp.int32)
        overflow = jnp.maximum(hits_total - capacity, 0) + row_overflow[ry]
        return tile_rows, count, overflow

    def tile_fn(tid: jax.Array):
        idx_buf, overflow = select_fn(tid)
        mu = means2d_p[idx_buf]  # (K, 2)
        co = conics_p[idx_buf]  # (K, 3)
        op = opac_p[idx_buf]  # (K,)
        pv = payl_p[idx_buf]  # (K, C)

        # -- 3. parallel alpha compositing ------------------------------
        x0, y0 = tile_origin(tid)
        pix = pix_off + jnp.array([x0, y0])  # (P, 2)
        dx = pix[None, :, 0] - mu[:, None, 0]  # (K, P)
        dy = pix[None, :, 1] - mu[:, None, 1]
        sigma = (
            0.5 * (co[:, None, 0] * dx * dx + co[:, None, 2] * dy * dy)
            + co[:, None, 1] * dx * dy
        )
        alpha = jnp.minimum(ALPHA_CLAMP, op[:, None] * jnp.exp(-sigma))
        alpha = jnp.where((sigma >= 0.0) & (alpha >= ALPHA_MIN), alpha, 0.0)
        # exclusive transmittance along the depth-ordered K axis
        trans = jnp.cumprod(1.0 - alpha, axis=0)
        trans = jnp.concatenate([jnp.ones((1, alpha.shape[1])), trans[:-1]], 0)
        w = alpha * trans  # (K, P)
        tile_img = jnp.einsum(
            "kp,kc->pc", w, pv, preferred_element_type=jnp.float32
        )  # (P, C)
        tile_alpha = jnp.sum(w, axis=0)  # (P,)
        return tile_img, tile_alpha, overflow

    return {
        "n": n,
        "num_tx": num_tx,
        "num_ty": num_ty,
        "num_tiles": num_tiles,
        "means2d_p": means2d_p,
        "conics_p": conics_p,
        "opac_p": opac_p,
        "payl_p": payl_p,
        "pix_off": pix_off,
        "select_fn": select_fn,
        "pack_fn": pack_fn,
        "tile_fn": tile_fn,
    }


def select_and_pack(
    proj: Projection,
    opacities: jax.Array,
    payload: jax.Array,
    width: int,
    height: int,
    capacity: int = 512,
    tile_chunk: int = 64,
    row_capacity: int | None = None,
    pack_via: str = "gather",
    _sel: dict | None = None,
) -> SelectPack:
    """Materialize the per-tile packed rows the fused compositing backends
    consume (also the profiling boundary between selection/pack and
    compositing — experiments/jobs/402).

    pack_via: "matmul" compacts each tile's rows as a one-hot MXU matmul
    (no indices materialized); "gather" is the original scatter-compaction
    + row gather. Both are exact and produce identical packed rows
    (tests/test_ops.py); evidence/raster_pack_ab_r5.json decides the
    production default."""
    sel = _sel or _selection(
        proj, opacities, payload, width, height, capacity, row_capacity
    )
    n = sel["n"]
    num_tiles, num_tx = sel["num_tiles"], sel["num_tx"]
    pad_tiles = _pad_to_multiple(num_tiles, tile_chunk)
    tids = jnp.concatenate(
        [
            jnp.arange(num_tiles, dtype=jnp.int32),
            jnp.zeros((pad_tiles - num_tiles,), jnp.int32),
        ]
    ).reshape(-1, tile_chunk)
    if pack_via == "matmul":
        packed, counts2d, overflows = jax.lax.map(
            jax.vmap(sel["pack_fn"]), tids
        )
        packed = packed.reshape(pad_tiles, capacity, -1)
        counts = counts2d.reshape(pad_tiles)
        x0 = (jnp.arange(pad_tiles, dtype=jnp.int32) % num_tx * TILE)
        y0 = (jnp.arange(pad_tiles, dtype=jnp.int32) // num_tx * TILE)
        x0 = jnp.where(jnp.arange(pad_tiles) < num_tiles, x0, 0)
        y0 = jnp.where(jnp.arange(pad_tiles) < num_tiles, y0, 0)
        pix = sel["pix_off"][None] + jnp.stack([x0, y0], -1)[
            :, None, :
        ].astype(jnp.float32)
        return SelectPack(
            packed=packed, pix=pix, counts=counts, overflows=overflows,
            num_tiles=num_tiles,
        )
    idx_all, overflows = jax.lax.map(jax.vmap(sel["select_fn"]), tids)
    idx_all = idx_all.reshape(pad_tiles, capacity)
    # contiguous packed rows: [mu(2), conic(3), opacity, payload(C)]
    packed_src = jnp.concatenate(
        [sel["means2d_p"], sel["conics_p"], sel["opac_p"][:, None],
         sel["payl_p"]],
        axis=1,
    )  # (n+1, 6+C)
    packed = packed_src[idx_all]  # (T, K, 6+C) gather
    x0 = (jnp.arange(pad_tiles, dtype=jnp.int32) % num_tx * TILE)
    y0 = (jnp.arange(pad_tiles, dtype=jnp.int32) // num_tx * TILE)
    x0 = jnp.where(jnp.arange(pad_tiles) < num_tiles, x0, 0)
    y0 = jnp.where(jnp.arange(pad_tiles) < num_tiles, y0, 0)
    pix = sel["pix_off"][None] + jnp.stack([x0, y0], -1)[:, None, :].astype(
        jnp.float32
    )  # (T, P, 2)
    # per-tile live rows: slots are front-packed in depth order, pad
    # index n marks empty — the pallas kernel's chunk loop stops at the
    # count
    counts = jnp.sum(idx_all < n, axis=1).astype(jnp.int32)
    return SelectPack(
        packed=packed, pix=pix, counts=counts, overflows=overflows,
        num_tiles=num_tiles,
    )


def rasterize_gaussians(
    proj: Projection,
    opacities: jax.Array,
    payload: jax.Array,
    width: int,
    height: int,
    capacity: int = 512,
    tile_chunk: int = 64,
    backend: str = "auto",
    row_capacity: int | None = None,
    pack_via: str = "gather",
) -> RasterOutputs:
    """Composite (N,) projected Gaussians carrying a (N, C) payload.

    opacities: (N,) post-sigmoid opacity (callers fold in the projection
    ``compensation``). capacity: static per-tile Gaussian budget; overflow
    beyond it is dropped far-to-near (reported in ``max_overflow`` — callers
    should log it, SURVEY quality rule "no silent caps").

    backend: "xla" composites inside the chunked tile map; "pallas" packs
    per-tile rows and runs the fused Pallas compositing kernel with its
    analytic backward (`ops/rasterize_pallas.py`); "matmul" packs the same
    rows and composites with the transmittance scan as one MXU triangular
    matmul (`composite_tiles_mm`); "auto" picks the fastest measured TPU
    backend (matmul) on TPU.
    """
    if backend == "auto":
        from uncertainty_nerf_gs_tpu.ops.backend import on_tpu

        backend = "pallas" if on_tpu() else "xla"
    sel = _selection(
        proj, opacities, payload, width, height, capacity, row_capacity
    )
    num_tiles = sel["num_tiles"]
    num_tx, num_ty = sel["num_tx"], sel["num_ty"]

    # -- chunked vmap over tiles to bound memory ------------------------
    pad_tiles = _pad_to_multiple(num_tiles, tile_chunk)
    tids = jnp.concatenate(
        [
            jnp.arange(num_tiles, dtype=jnp.int32),
            jnp.zeros((pad_tiles - num_tiles,), jnp.int32),
        ]
    ).reshape(-1, tile_chunk)

    if backend in ("pallas", "matmul"):
        sp = select_and_pack(
            proj, opacities, payload, width, height, capacity,
            tile_chunk=tile_chunk, row_capacity=row_capacity,
            pack_via=pack_via, _sel=sel,
        )
        if backend == "matmul":
            imgs, alphas = composite_tiles_mm(sp.packed, sp.pix, tile_chunk)
        else:
            from uncertainty_nerf_gs_tpu.ops.rasterize_pallas import (
                composite_tiles,
            )

            imgs, alphas = composite_tiles(sp.packed, sp.pix, sp.counts)
        overflows = sp.overflows
        imgs = imgs[:num_tiles]
        alphas = alphas[:num_tiles]
    else:
        imgs, alphas, overflows = jax.lax.map(jax.vmap(sel["tile_fn"]), tids)
        imgs = imgs.reshape(pad_tiles, TILE * TILE, -1)[:num_tiles]
        alphas = alphas.reshape(pad_tiles, TILE * TILE)[:num_tiles]

    c = payload.shape[-1]
    image = (
        imgs.reshape(num_ty, num_tx, TILE, TILE, c)
        .transpose(0, 2, 1, 3, 4)
        .reshape(num_ty * TILE, num_tx * TILE, c)[:height, :width]
    )
    alpha = (
        alphas.reshape(num_ty, num_tx, TILE, TILE)
        .transpose(0, 2, 1, 3)
        .reshape(num_ty * TILE, num_tx * TILE)[:height, :width]
    )
    return RasterOutputs(
        image=image, alpha=alpha, max_overflow=jnp.max(overflows).astype(jnp.int32)
    )


def rasterize_reference(
    proj: Projection,
    opacities: jax.Array,
    payload: jax.Array,
    width: int,
    height: int,
) -> tuple[jax.Array, jax.Array]:
    """Slow O(N*H*W) oracle: per-pixel full-depth-sorted blend, no tiling,
    no capacity cap. Test oracle for ``rasterize_gaussians`` (SURVEY §4)."""
    order = jnp.argsort(jnp.where(proj.valid, proj.depths, jnp.inf))
    mu = proj.means2d[order]
    co = proj.conics[order]
    op = jnp.where(proj.valid, opacities, 0.0)[order]
    pv = payload[order]

    ys, xs = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32) + 0.5,
        jnp.arange(width, dtype=jnp.float32) + 0.5,
        indexing="ij",
    )
    pix = jnp.stack([xs.ravel(), ys.ravel()], -1)  # (HW, 2)
    dx = pix[None, :, 0] - mu[:, None, 0]
    dy = pix[None, :, 1] - mu[:, None, 1]
    sigma = 0.5 * (co[:, None, 0] * dx**2 + co[:, None, 2] * dy**2) + co[:, None, 1] * dx * dy
    alpha = jnp.minimum(ALPHA_CLAMP, op[:, None] * jnp.exp(-sigma))
    alpha = jnp.where((sigma >= 0.0) & (alpha >= ALPHA_MIN), alpha, 0.0)
    trans = jnp.cumprod(1.0 - alpha, axis=0)
    trans = jnp.concatenate([jnp.ones((1, alpha.shape[1])), trans[:-1]], 0)
    w = alpha * trans
    img = jnp.einsum("kp,kc->pc", w, pv).reshape(height, width, -1)
    a = jnp.sum(w, 0).reshape(height, width)
    return img, a
