"""Tiled all-pairs proximity sweep for loop-closure candidate generation.

Replaces the reference's per-pose `scipy.spatial.KDTree.query_ball_point`
loop (reference orb_slam3_integration.py:167-217) with a single Pallas
kernel over (TI, TJ) tiles of the N x N pair space. A pair (i, j) is a
loop-closure candidate iff

    j - i >= min_gap   and   ||p_i - p_j||_2 <= radius

and it is *cross-floor* iff floor[i] != floor[j].

Exactness strategy (the reference computes in float64; we must reproduce its
integer candidate counts bit-for-bit):
  * positions are passed as a hi/lo float32 splitting of the float64 values;
    the kernel forms each coordinate difference as
    (hi_i - hi_j) + (lo_i - lo_j), which recovers the float64 difference to
    ~1 ulp, so the squared distance is accurate to ~1e-6 absolute near the
    threshold.
  * the kernel counts pairs with d2 <= r2_lo as "sure" and pairs with
    r2_lo < d2 <= r2_hi as "band" (r2_{lo,hi} = (r -+ eps)^2). Any tile with
    a nonzero band count is recomputed exactly on host in float64; sure
    counts are only trusted for band-free tiles. With eps = 1e-5 m the band
    is almost always empty, so the sweep runs entirely on-chip.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TI = 512
_TJ = 512


def _on_tpu() -> bool:
    return jax.devices()[0].platform == "tpu"


def _split_hi_lo(x: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Split float64 into (hi, lo) float32 pair with x ~= hi + lo."""
    hi = x.astype(np.float32)
    lo = (x - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


def _tile_counts(
    params_ref, rows_hi_ref, rows_lo_ref, cols_hi_ref, cols_lo_ref, tile_i, tile_j
):
    """Counts for one (TI, TJ) tile: [sure_total, sure_same, band, 0]."""
    n = params_ref[0, 0]
    min_gap = params_ref[0, 1]
    r2_lo = params_ref[0, 2]
    r2_hi = params_ref[0, 3]

    ti = rows_hi_ref.shape[0]
    tj = cols_hi_ref.shape[1]

    def coord_diff(k):
        a_hi = rows_hi_ref[:, k : k + 1]  # (TI, 1)
        a_lo = rows_lo_ref[:, k : k + 1]
        b_hi = cols_hi_ref[k : k + 1, :]  # (1, TJ)
        b_lo = cols_lo_ref[k : k + 1, :]
        return (a_hi - b_hi) + (a_lo - b_lo)  # (TI, TJ)

    dx = coord_diff(0)
    dy = coord_diff(1)
    dz = coord_diff(2)
    d2 = dx * dx + dy * dy + dz * dz

    i0 = tile_i * ti
    j0 = tile_j * tj
    row_ids = (
        i0 + jax.lax.broadcasted_iota(jnp.int32, (ti, tj), 0)
    ).astype(jnp.float32)
    col_ids = (
        j0 + jax.lax.broadcasted_iota(jnp.int32, (ti, tj), 1)
    ).astype(jnp.float32)

    pair_ok = (
        (col_ids - row_ids >= min_gap)
        & (row_ids < n)
        & (col_ids < n)
    )
    same_floor = rows_hi_ref[:, 3:4] == cols_hi_ref[3:4, :]

    sure = pair_ok & (d2 <= r2_lo)
    band = pair_ok & (d2 > r2_lo) & (d2 <= r2_hi)

    return jnp.stack(
        [
            jnp.sum(sure.astype(jnp.int32)),
            jnp.sum((sure & same_floor).astype(jnp.int32)),
            jnp.sum(band.astype(jnp.int32)),
            jnp.int32(0),
        ]
    )


def _count_kernel(
    params_ref,  # SMEM (1, 4): [n, min_gap, r2_lo, r2_hi] (float32)
    rows_hi_ref,  # (TI, 4) float32: x, y, z, floor for row block
    rows_lo_ref,  # (TI, 4)
    cols_hi_ref,  # (4, TJ)
    cols_lo_ref,  # (4, TJ)
    out_ref,  # (1, n_j, 4) int32 row of tiles
):
    counts = _tile_counts(
        params_ref, rows_hi_ref, rows_lo_ref, cols_hi_ref, cols_lo_ref,
        pl.program_id(0), pl.program_id(1),
    )
    out_ref[0, pl.program_id(1), :] = counts


@functools.partial(jax.jit, static_argnames=("n_i", "n_j", "interpret"))
def _run_count_kernel(params, rows_hi, rows_lo, cols_hi, cols_lo, n_i, n_j, interpret):
    return pl.pallas_call(
        _count_kernel,
        grid=(n_i, n_j),
        in_specs=[
            pl.BlockSpec((1, 4), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((_TI, 4), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TI, 4), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, _TJ), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, _TJ), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_j, 4), lambda i, j: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_i, n_j, 4), jnp.int32),
        interpret=interpret,
    )(params, rows_hi, rows_lo, cols_hi, cols_lo)


def _tri_count_kernel(
    ti_ref,  # SMEM (T,): row-tile index per grid step
    tj_ref,  # SMEM (T,): col-tile index per grid step
    params_ref,  # SMEM (1, 4)
    rows_hi_ref, rows_lo_ref, cols_hi_ref, cols_lo_ref,
    out_ref,  # (1, 4) int32 per grid step
):
    """Upper-triangle-only variant: a 1D grid walks precomputed (ti, tj)
    tile pairs with tj >= ti, skipping the ~half of the pair space that the
    j - i >= min_gap condition masks out entirely."""
    t = pl.program_id(0)
    counts = _tile_counts(
        params_ref, rows_hi_ref, rows_lo_ref, cols_hi_ref, cols_lo_ref,
        ti_ref[t], tj_ref[t],
    )
    out_ref[t, :] = counts


@functools.partial(jax.jit, static_argnames=("n_tiles", "interpret"))
def _run_tri_count_kernel(
    ti, tj, params, rows_hi, rows_lo, cols_hi, cols_lo, n_tiles, interpret
):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 4), lambda t, ti, tj: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((_TI, 4), lambda t, ti, tj: (ti[t], 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TI, 4), lambda t, ti, tj: (ti[t], 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, _TJ), lambda t, ti, tj: (0, tj[t]), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, _TJ), lambda t, ti, tj: (0, tj[t]), memory_space=pltpu.VMEM),
        ],
        # full-array output block resident in VMEM across the whole grid
        # (n_tiles x 4 int32 is tiny); each step writes its own row
        out_specs=pl.BlockSpec((n_tiles, 4), lambda t, ti, tj: (0, 0)),
    )
    return pl.pallas_call(
        _tri_count_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, 4), jnp.int32),
        interpret=interpret,
    )(ti, tj, params, rows_hi, rows_lo, cols_hi, cols_lo)


def _pack_inputs(positions: np.ndarray, floors: np.ndarray):
    """Pad to tile multiples and build row/col layouts with floor channel."""
    n = positions.shape[0]
    n_i = -(-n // _TI)
    n_j = -(-n // _TJ)
    n_pad = max(n_i * _TI, n_j * _TJ)

    p = np.full((n_pad, 4), np.float64(1e9), dtype=np.float64)
    p[:n, :3] = positions
    p[:n, 3] = floors.astype(np.float64)
    p[n:, 3] = -1.0  # padded floor label never matches a real one

    hi, lo = _split_hi_lo(p)
    rows_hi = hi[: n_i * _TI]
    rows_lo = lo[: n_i * _TI]
    cols_hi = np.ascontiguousarray(hi[: n_j * _TJ].T)
    cols_lo = np.ascontiguousarray(lo[: n_j * _TJ].T)
    return rows_hi, rows_lo, cols_hi, cols_lo, n_i, n_j


def _host_tile_counts(
    positions: np.ndarray,
    floors: np.ndarray,
    tile_i: int,
    tile_j: int,
    radius: float,
    min_gap: int,
) -> Tuple[int, int]:
    """Exact float64 counts (total, same_floor) for one (TI, TJ) tile."""
    n = positions.shape[0]
    i0, i1 = tile_i * _TI, min((tile_i + 1) * _TI, n)
    j0, j1 = tile_j * _TJ, min((tile_j + 1) * _TJ, n)
    if i0 >= n or j0 >= n:
        return 0, 0
    pi = positions[i0:i1]
    pj = positions[j0:j1]
    d2 = ((pi[:, None, :] - pj[None, :, :]) ** 2).sum(-1)
    ii = np.arange(i0, i1)[:, None]
    jj = np.arange(j0, j1)[None, :]
    ok = (jj - ii >= min_gap) & (d2 <= radius * radius)
    same = ok & (floors[i0:i1, None] == floors[None, j0:j1])
    return int(ok.sum()), int(same.sum())


def candidate_counts(
    positions: np.ndarray,
    floors: np.ndarray,
    radius: float = 2.0,
    min_gap: int = 100,
    eps: float = 1e-5,
    exact: bool = True,
) -> Tuple[int, int, int]:
    """Count loop-closure candidates and their floor split.

    Returns (total, same_floor, cross_floor) — integer-exact parity with the
    reference's float64 KDTree sweep when exact=True.
    """
    positions = np.asarray(positions, dtype=np.float64)
    floors = np.asarray(floors)
    n = positions.shape[0]
    if n == 0:
        return 0, 0, 0

    rows_hi, rows_lo, cols_hi, cols_lo, n_i, n_j = _pack_inputs(positions, floors)
    r_lo = max(radius - eps, 0.0) if exact else radius
    r_hi = radius + eps if exact else radius
    params = jnp.asarray(
        [[float(n), float(min_gap), r_lo * r_lo, r_hi * r_hi]], dtype=jnp.float32
    )

    # Upper-triangle tile enumeration: a (ti, tj) tile can only hold valid
    # pairs if its largest column index reaches min_gap past its smallest
    # row index — roughly half the tiles are skipped outright.
    ti_idx, tj_idx = np.meshgrid(np.arange(n_i), np.arange(n_j), indexing="ij")
    keep = (tj_idx + 1) * _TJ - 1 >= ti_idx * _TI + min_gap
    ti_list = np.ascontiguousarray(ti_idx[keep], np.int32)
    tj_list = np.ascontiguousarray(tj_idx[keep], np.int32)
    n_tiles = len(ti_list)

    tiles = np.asarray(
        _run_tri_count_kernel(
            jnp.asarray(ti_list),
            jnp.asarray(tj_list),
            params,
            jnp.asarray(rows_hi),
            jnp.asarray(rows_lo),
            jnp.asarray(cols_hi),
            jnp.asarray(cols_lo),
            n_tiles,
            not _on_tpu(),
        )
    )

    total = int(tiles[:, 0].sum())
    same = int(tiles[:, 1].sum())

    if exact:
        for t in np.nonzero(tiles[:, 2] > 0)[0]:
            # Discard this tile's on-device counts; recompute exactly.
            total -= int(tiles[t, 0])
            same -= int(tiles[t, 1])
            t_tot, t_same = _host_tile_counts(
                positions, floors, int(ti_list[t]), int(tj_list[t]), radius, min_gap
            )
            total += t_tot
            same += t_same

    return total, same, total - same


def candidate_counts_host(
    positions: np.ndarray,
    floors: np.ndarray,
    radius: float = 2.0,
    min_gap: int = 100,
    tile: int = 2048,
) -> Tuple[int, int, int]:
    """Pure-host float64 reference sweep (tiled numpy). Ground truth for tests."""
    positions = np.asarray(positions, dtype=np.float64)
    floors = np.asarray(floors)
    n = positions.shape[0]
    total = same = 0
    r2 = radius * radius
    for i0 in range(0, n, tile):
        i1 = min(i0 + tile, n)
        # only columns j >= i0 + min_gap can pair with this row block
        j_start = i0 + min_gap
        for j0 in range(max(j_start, 0), n, tile):
            j1 = min(j0 + tile, n)
            d2 = ((positions[i0:i1, None, :] - positions[None, j0:j1, :]) ** 2).sum(-1)
            ii = np.arange(i0, i1)[:, None]
            jj = np.arange(j0, j1)[None, :]
            ok = (jj - ii >= min_gap) & (d2 <= r2)
            total += int(ok.sum())
            same += int((ok & (floors[i0:i1, None] == floors[None, j0:j1])).sum())
    return total, same, total - same


def candidate_pairs_host(
    positions: np.ndarray,
    floors: np.ndarray,
    radius: float = 2.0,
    min_gap: int = 100,
    tile: int = 2048,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Materialize candidate pairs (i, j, dist) on host — float64 exact.

    Used when downstream stages (VPR / geometric verification) need the
    explicit pair list rather than counts.
    """
    positions = np.asarray(positions, dtype=np.float64)
    n = positions.shape[0]
    r2 = radius * radius
    out_i, out_j, out_d = [], [], []
    for i0 in range(0, n, tile):
        i1 = min(i0 + tile, n)
        for j0 in range(i0 + min_gap, n, tile):
            j1 = min(j0 + tile, n)
            d2 = ((positions[i0:i1, None, :] - positions[None, j0:j1, :]) ** 2).sum(-1)
            ii = np.arange(i0, i1)[:, None]
            jj = np.arange(j0, j1)[None, :]
            ok = (jj - ii >= min_gap) & (d2 <= r2)
            w = np.nonzero(ok)
            out_i.append(w[0] + i0)
            out_j.append(w[1] + j0)
            out_d.append(np.sqrt(d2[w]))
    if not out_i:
        z = np.zeros(0)
        return z.astype(np.int64), z.astype(np.int64), z
    return np.concatenate(out_i), np.concatenate(out_j), np.concatenate(out_d)
