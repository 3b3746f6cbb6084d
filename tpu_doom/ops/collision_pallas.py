"""Pallas TPU kernel for the player-movement collision sweeps.

One tick of player physics runs SIX swept-sphere passes against the
broad-phase triangle set (ref game/src/player.rs:142-190, 253-267):
a ground probe, `clip_substeps` clip-move substeps (each sweep feeds the
next via velocity projection), and the noclip ground probe. In XLA this
is ~500 small ops over (B, M, 3) arrays -- dispatch-bound on TPU
(~2.5 ms at B=64 for microseconds of real math). This kernel fuses the
whole sequence: each program owns a tile of E envs with its (13, M)
triangle rows resident in VMEM and runs every sweep back-to-back on the
VPU as (E, M) element-wise math + lane reductions.

The math is an exact component-wise port of `sim.collision.sweep_sphere`
(itself cited to /root/reference/math/src/sphere.rs:16-129 and
game/src/world.rs:84-102): same operation order, same eps guards, same
first-index min tie-break as `jnp.argmin`. The whole sweep sequence
lives in `_move_core`, evaluated EITHER as a Pallas kernel
(`player_move_pallas`) or as plain XLA (`player_move_jnp`) — the two
trace the same op graph, so trajectories are bit-identical between the
"xla" and "pallas" backends (asserted by tests/test_collision_kernel.py;
vs the vector-form oracle the results agree to fp-association noise,
which is why the oracle stays behind the "legacy" backend).

Triangle rows layout (built by `sim.collision.broadphase_rows`):
  [0:3) v0 | [3:6) v1 | [6:9) v2 | [9:12) normal | [12] mask
with the per-object y-offset already folded into the vertex rows.

Per-env state rows (B, 8): [px py pz vx vy vz 0 0].
Output rows (B, 16):
  [0] ground time | [1:4) ground normal (unit or 0)
  | [4:7) clip pos | [7:10) clip vel | [10] noclip probe time
  | [11:14) unused | [14:16) unused
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e4
INF = float("inf")
FEET_RADIUS = 0.2  # ref player.rs:254-256
NOCLIP_PROBE_H = 2000.0  # ref player.rs:171


def _sweep_tile(rows, mask, cx, cy, cz, dx, dy, dz, radius):
    """Swept sphere vs all M triangles for a tile of E envs.

    rows: tuple of 12 (E, M) triangle component arrays; mask (E, M) bool;
    center c*/displacement d* are (E, 1). Returns (time (E, 1) -- inf
    when no contact, unit-or-zero normal components (E, 1) x3).
    Mirrors sim.collision.sweep_sphere op for op."""
    (v0x, v0y, v0z, v1x, v1y, v1z, v2x, v2y, v2z, nx, ny, nz) = rows

    def dot_s(ax, ay, az, bx, by, bz):
        return ax * bx + ay * by + az * bz

    speed = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    moving = speed > 0.0
    sp_safe = jnp.where(moving, speed, 1.0)
    nvx, nvy, nvz = dx / sp_safe, dy / sp_safe, dz / sp_safe

    ndv = dot_s(nx, ny, nz, nvx, nvy, nvz)
    facing = ndv < 0.0

    intercept = -dot_s(v0x, v0y, v0z, nx, ny, nz)
    spd = dot_s(cx, cy, cz, nx, ny, nz) + intercept
    not_behind = spd >= -radius

    min_dist = jnp.full(mask.shape, jnp.float32(BIG))
    bnx = jnp.zeros(mask.shape, jnp.float32)
    bny = jnp.zeros(mask.shape, jnp.float32)
    bnz = jnp.zeros(mask.shape, jnp.float32)

    # --- plane face test (sphere.rs:45-53) -----------------------------
    safe_ndv = jnp.where(ndv == 0.0, -1.0, ndv)
    dist = -(spd - radius) / safe_ndv
    opx = cx + nvx * dist
    opy = cy + nvy * dist
    opz = cz + nvz * dist
    # point-in-triangle (sphere.rs:171-183)
    ux, uy, uz = v1x - v0x, v1y - v0y, v1z - v0z
    vx_, vy_, vz_ = v2x - v0x, v2y - v0y, v2z - v0z
    cnx = uy * vz_ - uz * vy_
    cny = uz * vx_ - ux * vz_
    cnz = ux * vy_ - uy * vx_
    wx, wy, wz = opx - v0x, opy - v0y, opz - v0z
    n2 = dot_s(cnx, cny, cnz, cnx, cny, cnz)
    n2_safe = jnp.where(n2 == 0.0, 1.0, n2)
    # cross(u, w)
    uwx = uy * wz - uz * wy
    uwy = uz * wx - ux * wz
    uwz = ux * wy - uy * wx
    gamma = dot_s(uwx, uwy, uwz, cnx, cny, cnz) / n2_safe
    # cross(w, v)
    wvx = wy * vz_ - wz * vy_
    wvy = wz * vx_ - wx * vz_
    wvz = wx * vy_ - wy * vx_
    beta = dot_s(wvx, wvy, wvz, cnx, cny, cnz) / n2_safe
    alpha = 1.0 - gamma - beta
    inside = (
        (n2 > 0.0)
        & (alpha >= 0.0) & (alpha <= 1.0)
        & (beta >= 0.0) & (beta <= 1.0)
        & (gamma >= 0.0) & (gamma <= 1.0)
    )
    plane_ok = (spd >= radius) & inside
    min_dist = jnp.where(plane_ok, dist, min_dist)
    bnx = jnp.where(plane_ok, nx, bnx)
    bny = jnp.where(plane_ok, ny, bny)
    bnz = jnp.where(plane_ok, nz, bnz)

    # --- vertex tests (sphere.rs:55-64) --------------------------------
    cc = dot_s(cx, cy, cz, cx, cy, cz)
    for px, py, pz in ((v0x, v0y, v0z), (v1x, v1y, v1z), (v2x, v2y, v2z)):
        # sphere vs line (v, v - nvel): edge = -nvel
        b = 2.0 * dot_s(-nvx, -nvy, -nvz, px - cx, py - cy, pz - cz)
        c = (
            cc
            + dot_s(px, py, pz, px, py, pz)
            - 2.0 * dot_s(px, py, pz, cx, cy, cz)
            - radius * radius
        )
        # lowest quadratic root of x^2 + bx + c (sphere.rs:142-157)
        disc = b * b - 4.0 * c
        okroot = disc >= 0.0
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        r1 = (-b + sq) / 2.0
        r2 = (-b - sq) / 2.0
        d = jnp.where(okroot, jnp.minimum(r1, r2), jnp.float32(INF))
        ok = (d >= 0.0) & (d < min_dist)
        min_dist = jnp.where(ok, d, min_dist)
        bnx = jnp.where(ok, cx - (px - nvx * d), bnx)
        bny = jnp.where(ok, cy - (py - nvy * d), bny)
        bnz = jnp.where(ok, cz - (pz - nvz * d), bnz)

    # --- edge tests (sphere.rs:67-119) ---------------------------------
    for (e1x, e1y, e1z), (e2x, e2y, e2z) in (
        ((v0x, v0y, v0z), (v1x, v1y, v1z)),
        ((v1x, v1y, v1z), (v2x, v2y, v2z)),
        ((v2x, v2y, v2z), (v0x, v0y, v0z)),
    ):
        edx, edy, edz = e2x - e1x, e2y - e1y, e2z - e1z
        # en = cross(nvel, edge)
        enx = nvy * edz - nvz * edy
        eny = nvz * edx - nvx * edz
        enz = nvx * edy - nvy * edx
        en_mag = jnp.sqrt(dot_s(enx, eny, enz, enx, eny, enz))
        en_ok = en_mag >= 1e-16
        en_div = jnp.maximum(en_mag, 1e-30)
        enx = jnp.where(en_ok, enx / en_div, 0.0)
        eny = jnp.where(en_ok, eny / en_div, 0.0)
        enz = jnp.where(en_ok, enz / en_div, 0.0)
        edge_intercept = -dot_s(e1x, e1y, e1z, enx, eny, enz)
        edge_distance = dot_s(cx, cy, cz, enx, eny, enz) + edge_intercept
        near_plane = jnp.abs(edge_distance) <= radius

        circle_r = jnp.sqrt(
            jnp.maximum(radius * radius - edge_distance * edge_distance, 0.0)
        )
        ccx = cx - enx * edge_distance
        ccy = cy - eny * edge_distance
        ccz = cz - enz * edge_distance
        ecx, ecy, ecz = ccx - e1x, ccy - e1y, ccz - e1z
        edge_m2 = jnp.maximum(dot_s(edx, edy, edz, edx, edy, edz), 1e-30)
        fr = dot_s(ecx, ecy, ecz, edx, edy, edz) / edge_m2
        olx = e1x + edx * fr
        oly = e1y + edy * fr
        olz = e1z + edz * fr
        dirx, diry, dirz = olx - ccx, oly - ccy, olz - ccz
        dmag = jnp.sqrt(dot_s(dirx, diry, dirz, dirx, diry, dirz))
        d_ok = dmag >= 1e-16
        d_div = jnp.maximum(dmag, 1e-30)
        dirx = jnp.where(d_ok, dirx / d_div, 0.0)
        diry = jnp.where(d_ok, diry / d_div, 0.0)
        dirz = jnp.where(d_ok, dirz / d_div, 0.0)
        cax = ccx + dirx * circle_r
        cay = ccy + diry * circle_r
        caz = ccz + dirz * circle_r

        # 2-axis projection excluding the largest |en| component
        # (sphere.rs:87-100).
        a0, a1, a2 = jnp.abs(enx), jnp.abs(eny), jnp.abs(enz)
        use12 = (a0 > a1) & (a0 > a2)
        use02 = ~use12 & (a1 > a2)

        def pick(x, y, z):
            d1 = jnp.where(use12, y, x)
            d2 = jnp.where(use12 | use02, z, y)
            return d1, d2

        p1x_, p1y_ = pick(cax, cay, caz)
        p2x_, p2y_ = pick(cax + nvx, cay + nvy, caz + nvz)
        q1x_, q1y_ = pick(e1x, e1y, e1z)
        q2x_, q2y_ = pick(e2x, e2y, e2z)
        d1x = p2x_ - p1x_
        d1y = p2y_ - p1y_
        d2x = q1x_ - q2x_
        d2y = q1y_ - q2y_
        denom = d2y * d1x - d2x * d1y
        nonpar = denom != 0.0
        tt = (d2x * (p1y_ - q1y_) - d2y * (p1x_ - q1x_)) / jnp.where(
            nonpar, denom, 1.0
        )
        inx = cax + nvx * tt
        iny = cay + nvy * tt
        inz = caz + nvz * tt
        between = (
            dot_s(e1x - inx, e1y - iny, e1z - inz,
                  e2x - inx, e2y - iny, e2z - inz)
            <= 0.0
        )
        ok = near_plane & nonpar & (tt >= 0.0) & (tt < min_dist) & between
        min_dist = jnp.where(ok, tt, min_dist)
        bnx = jnp.where(ok, cx - cax, bnx)
        bny = jnp.where(ok, cy - cay, bny)
        bnz = jnp.where(ok, cz - caz, bnz)

    valid = moving & facing & not_behind & (min_dist < BIG) & mask
    dist_or_inf = jnp.where(valid, min_dist, jnp.float32(INF))
    # First-index min (== jnp.argmin tie rule), as lane reductions.
    m = jnp.min(dist_or_inf, axis=1, keepdims=True)  # (E, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, mask.shape, 1)
    bi = jnp.min(
        jnp.where(dist_or_inf == m, lane, jnp.int32(2**30)),
        axis=1, keepdims=True,
    )
    sel = lane == bi
    time = m / sp_safe
    onx = jnp.sum(jnp.where(sel, bnx, 0.0), axis=1, keepdims=True)
    ony = jnp.sum(jnp.where(sel, bny, 0.0), axis=1, keepdims=True)
    onz = jnp.sum(jnp.where(sel, bnz, 0.0), axis=1, keepdims=True)
    nmag = jnp.sqrt(onx * onx + ony * ony + onz * onz)
    n_ok = nmag >= 1e-16
    n_div = jnp.maximum(nmag, 1e-30)
    onx = jnp.where(n_ok, onx / n_div, 0.0)
    ony = jnp.where(n_ok, ony / n_div, 0.0)
    onz = jnp.where(n_ok, onz / n_div, 0.0)
    return time, onx, ony, onz


def _move_core(rows, mask, st, *, radius, height, dt, substeps,
               enable_noclip):
    """The full movement-sweep sequence on (E, M) component arrays.

    Shared VERBATIM by the Pallas kernel and the plain-jnp "xla"
    backend (`player_move_jnp`), so the two backends trace identical op
    graphs and produce bit-identical trajectories (a 1-ulp difference
    here flips grounded/jump branches downstream). Returns (E, 16) in
    the output row layout of the module docstring."""
    z1 = jnp.zeros(st[:, 0:1].shape, jnp.float32)
    px = st[:, 0:1]
    py = st[:, 1:2]
    pz = st[:, 2:3]
    vx = st[:, 3:4]
    vy = st[:, 4:5]
    vz = st[:, 5:6]

    # Ground probe (player.rs:253-267): feet radius, -height displacement.
    gt, gnx, gny, gnz = _sweep_tile(
        rows, mask, px, py, pz, z1, z1 - jnp.float32(height), z1,
        jnp.float32(FEET_RADIUS),
    )

    # Clip loop (player.rs:142-166), fixed masked substeps.
    cpx, cpy, cpz = px, py, pz
    cvx, cvy, cvz = vx, vy, vz
    time_left = z1 + jnp.float32(dt)
    done = z1 > 1.0  # all-false
    for _ in range(substeps):
        dx = cvx * time_left
        dy = cvy * time_left
        dz = cvz * time_left
        ct, cnx, cny, cnz = _sweep_tile(
            rows, mask, cpx, cpy, cpz, dx, dy, dz, jnp.float32(radius)
        )
        dmag = jnp.sqrt(dx * dx + dy * dy + dz * dz)
        adjusted = ct - 0.001 / jnp.where(dmag > 0.0, dmag, 1.0)
        hit = ct < jnp.float32(INF)
        blocked = hit & (adjusted < 1.0) & ~done
        tcl = jnp.clip(ct, 0.0, 1.0)
        adv = jnp.where(blocked, adjusted, 1.0)
        cpx = jnp.where(done, cpx, cpx + dx * adv)
        cpy = jnp.where(done, cpy, cpy + dy * adv)
        cpz = jnp.where(done, cpz, cpz + dz * adv)
        ndv = cnx * cvx + cny * cvy + cnz * cvz
        cvx = jnp.where(blocked, cvx - cnx * ndv, cvx)
        cvy = jnp.where(blocked, cvy - cny * ndv, cvy)
        cvz = jnp.where(blocked, cvz - cnz * ndv, cvz)
        time_left = jnp.where(blocked, time_left * (1.0 - tcl), time_left)
        done = done | ~blocked

    # Noclip ground probe (player.rs:168-190): from pos + vel*dt,
    # probe_h tall, downward; post-processing happens in step_player.
    if enable_noclip:
        ph = jnp.float32(NOCLIP_PROBE_H)
        nx_ = px + vx * jnp.float32(dt)
        ny_ = py + vy * jnp.float32(dt) + ph * 0.5
        nz_ = pz + vz * jnp.float32(dt)
        nt, _, _, _ = _sweep_tile(
            rows, mask, nx_, ny_, nz_, z1, z1 - ph, z1, jnp.float32(radius)
        )
    else:
        nt = jnp.full(z1.shape, jnp.float32(INF))
    pad = jnp.zeros((z1.shape[0], 5), jnp.float32)
    return jnp.concatenate(
        [gt, gnx, gny, gnz, cpx, cpy, cpz, cvx, cvy, cvz, nt, pad],
        axis=1,
    )


def _move_kernel(rows_ref, st_ref, out_ref, *, radius, height, dt,
                 substeps, enable_noclip):
    rows = tuple(rows_ref[:, i] for i in range(12))  # each (E, M)
    mask = rows_ref[:, 12] > 0.5
    out_ref[:, :] = _move_core(
        rows, mask, st_ref[:, :], radius=radius, height=height, dt=dt,
        substeps=substeps, enable_noclip=enable_noclip,
    )


@functools.partial(
    jax.jit,
    static_argnames=("radius", "height", "dt", "substeps", "enable_noclip"),
)
def player_move_jnp(
    rows,  # (B, 13, M) f32 triangle rows (broadphase_rows layout)
    state8,  # (B, 8) f32 [pos, vel, 0, 0]
    radius: float,
    height: float,
    dt: float,
    substeps: int,
    enable_noclip: bool = True,
):
    """Plain-XLA evaluation of `_move_core` on the whole batch — the
    same op graph as the Pallas kernel, for CPU and for bit-equality
    testing."""
    comp = tuple(rows[:, i] for i in range(12))
    mask = rows[:, 12] > 0.5
    return _move_core(
        comp, mask, state8, radius=float(radius), height=float(height),
        dt=float(dt), substeps=int(substeps),
        enable_noclip=bool(enable_noclip),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "radius", "height", "dt", "substeps", "enable_noclip", "env_tile",
        "interpret",
    ),
)
def player_move_pallas(
    rows,  # (B, 13, M) f32 triangle rows (broadphase_rows layout)
    state8,  # (B, 8) f32 [pos, vel, 0, 0]
    radius: float,
    height: float,
    dt: float,
    substeps: int,
    enable_noclip: bool = True,
    env_tile: int = 8,
    interpret: bool = False,
):
    """Fused ground-probe + clip-move + noclip-probe -> (B, 16) f32
    (see module docstring for the output row layout)."""
    b, _, m = rows.shape
    pad_m = (-m) % 128
    if pad_m:
        rows = jnp.pad(rows, ((0, 0), (0, 0), (0, pad_m)))
    pad_b = (-b) % env_tile
    if pad_b:
        rows = jnp.pad(rows, ((0, pad_b), (0, 0), (0, 0)))
        state8 = jnp.pad(state8, ((0, pad_b), (0, 0)))
    m_p = m + pad_m
    b_p = b + pad_b

    kernel = functools.partial(
        _move_kernel, radius=float(radius), height=float(height),
        dt=float(dt), substeps=int(substeps),
        enable_noclip=bool(enable_noclip),
    )
    out = pl.pallas_call(
        kernel,
        grid=(b_p // env_tile,),
        in_specs=[
            pl.BlockSpec((env_tile, 13, m_p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((env_tile, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((env_tile, 16), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_p, 16), jnp.float32),
        interpret=interpret,
    )(rows, state8)
    return out[:b]
