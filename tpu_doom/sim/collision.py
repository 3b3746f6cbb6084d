"""Vectorized swept-sphere collision against the level's triangle soup.

Reference behavior: /root/reference/math/src/sphere.rs (sweep_triangle:
plane face test, per-vertex lowest-quadratic-root tests, per-edge tests)
and game/src/world.rs (sweep over chunks, min-time contact; dynamic chunks
offset by their object transform).

TPU-native design: instead of the reference's BSP descent with per-chunk
scalar loops, all T triangles are tested at once per env with masked
min-reductions (SURVEY.md section 2.4: "brute-force sphere-vs-all-triangles
per env with min-reduce"). Dynamic object motion is a pure +y offset, so
instead of inverse-transforming the sphere we add `offset[coll_object]`
to triangle y (equivalent for translations).

All functions are single-env; batch via jax.vmap in sim.step.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

BIG = jnp.float32(1e4)
INF = jnp.float32(jnp.inf)


class Contact(NamedTuple):
    time: jnp.ndarray  # scalar f32; inf when no contact
    normal: jnp.ndarray  # (3,) f32 (unnormalized until min-selected)

    @property
    def hit(self):
        return jnp.isfinite(self.time)


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _lowest_quadratic_root(a, b, c):
    """Smaller root of ax^2+bx+c, or +inf when no real root
    (ref sphere.rs:142-157)."""
    disc = b * b - 4.0 * a * c
    ok = disc >= 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    a2 = 2.0 * a
    r1 = (-b + sq) / a2
    r2 = (-b - sq) / a2
    return jnp.where(ok, jnp.minimum(r1, r2), INF)


def _point_in_triangle(v0, v1, v2, p):
    """Barycentric containment (ref sphere.rs:171-183). All (T,3)."""
    u = v1 - v0
    v = v2 - v0
    n = jnp.cross(u, v)
    w = p - v0
    n2 = _dot(n, n)
    n2_safe = jnp.where(n2 == 0.0, 1.0, n2)
    gamma = _dot(jnp.cross(u, w), n) / n2_safe
    beta = _dot(jnp.cross(w, v), n) / n2_safe
    alpha = 1.0 - gamma - beta
    inside = (
        (n2 > 0.0)
        & (alpha >= 0.0) & (alpha <= 1.0)
        & (beta >= 0.0) & (beta <= 1.0)
        & (gamma >= 0.0) & (gamma <= 1.0)
    )
    return inside


def _edge_candidate(center, radius, nvel, e1, e2, min_dist, best_normal):
    """One edge test for all triangles at once (ref sphere.rs:67-119).
    Returns updated (min_dist, best_normal)."""
    edge = e2 - e1  # (T,3)
    en = jnp.cross(jnp.broadcast_to(nvel, edge.shape), edge)
    en_mag = jnp.sqrt(_dot(en, en))
    en = jnp.where(en_mag[:, None] >= 1e-16, en / jnp.maximum(en_mag, 1e-30)[:, None], 0.0)
    edge_intercept = -_dot(e1, en)
    edge_distance = _dot(jnp.broadcast_to(center, en.shape), en) + edge_intercept
    near_plane = jnp.abs(edge_distance) <= radius

    circle_r = jnp.sqrt(jnp.maximum(radius * radius - edge_distance * edge_distance, 0.0))
    circle_c = center - en * edge_distance[:, None]
    e1c = circle_c - e1
    edge_m2 = jnp.maximum(_dot(edge, edge), 1e-30)
    disp = edge * (_dot(e1c, edge) / edge_m2)[:, None]
    on_line = e1 + disp
    dir_ = on_line - circle_c
    dmag = jnp.sqrt(_dot(dir_, dir_))
    dir_ = jnp.where(dmag[:, None] >= 1e-16, dir_ / jnp.maximum(dmag, 1e-30)[:, None], 0.0)
    cand = circle_c + dir_ * circle_r[:, None]

    # Project onto the 2 axes where |edge_normal| is smallest-ish
    # (ref sphere.rs:87-100 picks dims excluding the largest component).
    abs_en = jnp.abs(en)
    a0, a1, a2 = abs_en[:, 0], abs_en[:, 1], abs_en[:, 2]
    use12 = (a0 > a1) & (a0 > a2)  # -> dims (1, 2)
    use02 = ~use12 & (a1 > a2)  # -> dims (0, 2)
    # else dims (0, 1)
    def pick(v):
        d1 = jnp.where(use12, v[:, 1], v[:, 0])
        d2 = jnp.where(use12 | use02, v[:, 2], v[:, 1])
        return d1, d2

    p1x, p1y = pick(cand)
    p2x, p2y = pick(cand + nvel)
    e1x, e1y = pick(e1)
    e2x, e2y = pick(e2)
    # intersect_line_line (ref sphere.rs:159-169)
    d1x, d1y = p2x - p1x, p2y - p1y
    d2x, d2y = e1x - e2x, e1y - e2y
    denom = d2y * d1x - d2x * d1y
    nonpar = denom != 0.0
    t = (d2x * (p1y - e1y) - d2y * (p1x - e1x)) / jnp.where(nonpar, denom, 1.0)

    inter = cand + nvel * t[:, None]
    between = _dot(e1 - inter, e2 - inter) <= 0.0
    ok = near_plane & nonpar & (t >= 0.0) & (t < min_dist) & between
    normal = center - cand
    new_min = jnp.where(ok, t, min_dist)
    new_normal = jnp.where(ok[:, None], normal, best_normal)
    return new_min, new_normal


def sweep_sphere(
    center,  # (3,)
    radius,  # scalar
    displacement,  # (3,) -- NOTE: full displacement, time is a fraction of it
    v0,  # (T, 3) triangle vertices (already object-offset)
    v1,
    v2,
    normal,  # (T, 3)
    tri_mask=None,  # optional (T,) bool: False entries never contact
):
    """First contact of a swept sphere against all triangles; returns
    Contact(time=fraction of displacement in [0, inf), unit normal).

    Matches the reference exactly per-triangle (sphere.rs:16-129), then
    min-reduces over triangles (world.rs:84-102)."""
    speed = jnp.sqrt(_dot(displacement, displacement))
    moving = speed > 0.0
    nvel = displacement / jnp.where(moving, speed, 1.0)

    ndv = _dot(normal, nvel)  # (T,)
    facing = ndv < 0.0

    intercept = -_dot(v0, normal)
    spd = _dot(jnp.broadcast_to(center, v0.shape), normal) + intercept
    not_behind = spd >= -radius

    min_dist = jnp.full(v0.shape[:1], BIG)
    best_normal = jnp.zeros_like(v0)

    # Plane face test (sphere.rs:45-53).
    safe_ndv = jnp.where(ndv == 0.0, -1.0, ndv)
    dist = -(spd - radius) / safe_ndv
    on_plane = center + nvel * dist[:, None]
    plane_ok = (spd >= radius) & _point_in_triangle(v0, v1, v2, on_plane)
    min_dist = jnp.where(plane_ok, dist, min_dist)
    best_normal = jnp.where(plane_ok[:, None], normal, best_normal)

    # Vertex tests (sphere.rs:55-64): sphere against line (v, v - nvel).
    for vert in (v0, v1, v2):
        p1 = vert
        edge = -nvel  # unit
        b = 2.0 * _dot(jnp.broadcast_to(edge, p1.shape), p1 - center)
        c = (
            _dot(center, center)
            + _dot(p1, p1)
            - 2.0 * _dot(p1, jnp.broadcast_to(center, p1.shape))
            - radius * radius
        )
        d = _lowest_quadratic_root(jnp.float32(1.0), b, c)
        ok = (d >= 0.0) & (d < min_dist)
        n = center - (vert - nvel * d[:, None])
        min_dist = jnp.where(ok, d, min_dist)
        best_normal = jnp.where(ok[:, None], n, best_normal)

    # Edge tests (sphere.rs:67-119).
    min_dist, best_normal = _edge_candidate(
        center, radius, nvel, v0, v1, min_dist, best_normal
    )
    min_dist, best_normal = _edge_candidate(
        center, radius, nvel, v1, v2, min_dist, best_normal
    )
    min_dist, best_normal = _edge_candidate(
        center, radius, nvel, v2, v0, min_dist, best_normal
    )

    valid = moving & facing & not_behind & (min_dist < BIG)
    if tri_mask is not None:
        valid = valid & tri_mask
    dist_or_inf = jnp.where(valid, min_dist, INF)
    best = jnp.argmin(dist_or_inf)
    time = dist_or_inf[best] / jnp.where(moving, speed, 1.0)
    n = best_normal[best]
    nmag = jnp.sqrt(_dot(n, n))
    n = jnp.where(nmag >= 1e-16, n / jnp.maximum(nmag, 1e-30), jnp.zeros(3))
    return Contact(time=time, normal=n)


def offset_triangles(scene, object_offset):
    """Apply per-object y offsets to collision triangle vertices.

    object_offset: (O,) f32 for a single env. Returns (v0, v1, v2) with y
    shifted; normals are invariant under translation."""
    dy = object_offset[scene.coll_object]  # (T,)
    shift = jnp.stack([jnp.zeros_like(dy), dy, jnp.zeros_like(dy)], axis=-1)
    return (
        scene.coll_v0 + shift,
        scene.coll_v1 + shift,
        scene.coll_v2 + shift,
    )


def broadphase_triangles(scene, object_offset, pos):
    """Gather the player's XZ grid cell's triangle list (see
    geom/broadphase.py) and apply object offsets; returns
    (v0, v1, v2, normal, mask) with M rows (M = max cell occupancy).

    The (M, 13) per-triangle row fetch rides ONE one-hot MXU matmul
    instead of five XLA fancy-index gathers (~8 ns per gathered element
    on TPU; the one-hot row-select is exact in f32)."""
    rel = (jnp.stack([pos[0], pos[2]]) - scene.bp_origin) * scene.bp_inv_cell
    cx = jnp.clip(jnp.floor(rel[0]).astype(jnp.int32), 0, scene.bp_dims[0] - 1)
    cz = jnp.clip(jnp.floor(rel[1]).astype(jnp.int32), 0, scene.bp_dims[1] - 1)
    idx = scene.bp_cells[cx * scene.bp_dims[1] + cz]  # (M,)
    mask = idx >= 0
    safe = jnp.maximum(idx, 0)
    # Per-triangle rows [v0 | v1 | v2 | normal | dy] at (T,) scale (the
    # tiny dy gather over T stays), then one (M, T) @ (T, 13) select.
    dy_t = object_offset[scene.coll_object]  # (T,)
    table = jnp.concatenate(
        [
            scene.coll_v0, scene.coll_v1, scene.coll_v2,
            scene.coll_normal, dy_t[:, None],
        ],
        axis=1,
    )  # (T, 13)
    onehot = (safe[:, None] == jnp.arange(table.shape[0])[None, :]).astype(
        jnp.float32
    )
    # precision=HIGHEST is REQUIRED: the default matmul precision
    # truncates both operands to bf16 (measured, even on CPU), which
    # perturbs vertex coordinates and silently diverges broadphase
    # trajectories from the brute-force sweep.
    rows = jnp.einsum(
        "mt,tc->mc", onehot, table, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # exact f32 row-select (one-hot rows)
    dy = rows[:, 12]
    shift = jnp.stack([jnp.zeros_like(dy), dy, jnp.zeros_like(dy)], axis=-1)
    return (
        rows[:, 0:3] + shift,
        rows[:, 3:6] + shift,
        rows[:, 6:9] + shift,
        rows[:, 9:12],
        mask,
    )


def broadphase_rows(scene, object_offset, pos):
    """Broad-phase triangle set as (13, M) component rows for the Pallas
    movement kernel (ops/collision_pallas.py): [v0 | v1 | v2 | normal |
    mask] with the object y-offset already folded into the vertex rows.
    Same cell fetch and same f32 adds as `broadphase_triangles`, so the
    two layouts are bit-identical."""
    rel = (jnp.stack([pos[0], pos[2]]) - scene.bp_origin) * scene.bp_inv_cell
    cx = jnp.clip(jnp.floor(rel[0]).astype(jnp.int32), 0, scene.bp_dims[0] - 1)
    cz = jnp.clip(jnp.floor(rel[1]).astype(jnp.int32), 0, scene.bp_dims[1] - 1)
    idx = scene.bp_cells[cx * scene.bp_dims[1] + cz]  # (M,)
    mask = idx >= 0
    safe = jnp.maximum(idx, 0)
    dy_t = object_offset[scene.coll_object]  # (T,)
    table = jnp.concatenate(
        [
            scene.coll_v0, scene.coll_v1, scene.coll_v2,
            scene.coll_normal, dy_t[:, None],
        ],
        axis=1,
    )  # (T, 13)
    onehot = (safe[:, None] == jnp.arange(table.shape[0])[None, :]).astype(
        jnp.float32
    )
    rows = jnp.einsum(
        "mt,tc->cm", onehot, table, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (13, M) exact f32 row-select
    dy = rows[12][None, :]
    return jnp.concatenate(
        [
            rows[0:1], rows[1:2] + dy, rows[2:3],
            rows[3:4], rows[4:5] + dy, rows[5:6],
            rows[6:7], rows[7:8] + dy, rows[8:9],
            rows[9:12],
            mask[None, :].astype(jnp.float32),
        ],
        axis=0,
    )
