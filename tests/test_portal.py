"""Portal (column) renderer vs the triangle rasterizer: pixel equality at
zero pitch across feature-covering camera poses."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_doom.models import DoomSim
from tpu_doom.utils.config import GameConfig

W, H = 100, 64


@pytest.fixture(scope="module")
def sims():
    simj = DoomSim(
        GameConfig(wad_file=":test:", width=W, height=H, batch_size=1,
                   raster_backend="jnp")
    )
    simp = DoomSim(
        GameConfig(wad_file=":test:", width=W, height=H, batch_size=1,
                   raster_backend="portal", portal_crossings=12)
    )
    return simj, simp


POSES = [
    # (name, pos, yaw, time, door, lift)
    ("start", [-2.56, 0.5, -2.24], 0.0, 0.0, 0.0, 0.0),
    ("corridor_door", [-2.56, 0.33, -5.4], 0.0, 0.4, 0.0, 0.0),
    ("door_half_open", [-2.56, 0.33, -5.4], 0.0, 0.0, 0.5, 0.0),
    ("big_room_sky", [-2.2, 0.2, -8.8], 0.9, 1.25, 0.0, 0.0),
    ("nukage_anim", [-1.9, 0.2, -8.2], 0.0, 8.0 / 35.0 + 1e-3, 0.0, 0.0),
    ("grate", [-3.5, 1.0, -9.0], 0.0, 0.4, 0.0, 0.0),
    ("barrel", [-3.8, 0.0, -9.8], 0.0, 0.0, 0.0, 0.0),
    ("lift_down", [-2.56, 0.2, -12.0], 0.0, 0.0, 0.0, -0.64),
    ("scroll_wall", [-2.56, 0.33, -2.5], math.pi, 0.5, 0.0, 0.0),
    ("flicker", [-3.84, 0.0, -10.9], math.pi, 0.24, 0.0, 0.0),
]


# Pinned per-pose mismatch-PIXEL ceilings (VERDICT r1 item 9): the
# measured fp-tie counts at the span/depth boundaries where the portal's
# analytic depth ties against the rasterizer's interpolated depth,
# with ~50% headroom. Optimization work must not silently widen these.
MISMATCH_CEILING = {
    "start": 0, "corridor_door": 0, "door_half_open": 0,
    "big_room_sky": 51, "nukage_anim": 0, "grate": 0, "barrel": 0,
    "lift_down": 6, "scroll_wall": 0, "flicker": 93,
}


def test_portal_matches_triangle_path(sims):
    simj, simp = sims
    counts = {}
    for name, pos, yaw, time, door, lift in POSES:
        state = simj.reset(1)
        state = state._replace(
            pos=jnp.array([pos], jnp.float32),
            yaw=jnp.array([yaw], jnp.float32),
            time=jnp.array([time], jnp.float32),
        )
        state = state._replace(
            object_offset=state.object_offset.at[0, 1].set(door).at[0, 2].set(lift)
        )
        ij, cj = simj.render(state)
        ip, cp = simp.render(state)
        counts[name] = int((np.asarray(ij[0]) != np.asarray(ip[0])).sum())
    for name, n in counts.items():
        assert n <= MISMATCH_CEILING[name], (name, counts)
        assert n <= 0.01 * W * H, (name, counts)  # >= 99% equal, always

@pytest.fixture(scope="module")
def simt():
    """Portal sim in portal_pitch='triangle' mode (r2 pitch fallback)."""
    return DoomSim(
        GameConfig(wad_file=":test:", width=W, height=H, batch_size=1,
                   raster_backend="portal", portal_crossings=12,
                   portal_pitch="triangle")
    )


def test_portal_pitch_triangle_mode_matches_triangle_path(sims, simt):
    """portal_pitch='triangle': envs with nonzero pitch render via the
    exact triangle fallback (r2 behavior, ref player.rs:205-217)."""
    simj, _ = sims
    for pitch in (-0.4, 0.4):
        state = simj.reset(1)
        state = state._replace(
            pos=jnp.array([[-2.2, 0.2, -8.8]], jnp.float32),
            yaw=jnp.array([0.9], jnp.float32),
            pitch=jnp.array([pitch], jnp.float32),
        )
        ij, cj = simj.render(state)
        ip, cp = simt.render(state)
        np.testing.assert_array_equal(np.asarray(ij), np.asarray(ip), err_msg=str(pitch))
        np.testing.assert_array_equal(np.asarray(cj), np.asarray(cp), err_msg=str(pitch))


def test_portal_pitch_shear_crop_equivalence(sims):
    """The strongest shear invariant: at yaw=0, a pitched shear frame's
    rows [n, H) equal the ZERO-pitch frame's rows [0, H-n) rendered from
    the pitch-compensated camera position, where n = round(row_shear) --
    shear is exactly a window shift of the zero-pitch render (plus the
    exact sky shift, which at yaw=0 has no u component). The only
    tolerated mismatches are span-boundary rows where the fractional
    row_shear (pitch cannot make it exactly integer in f32) and the
    1-ulp camera recomposition move an edge across an integer row."""
    _, simp = sims
    import math as m

    pcfg = simp.config.player
    p11 = 1.0 / m.tan(m.radians(simp.config.fov) / 2.0)
    n = 10
    pitch = m.atan(2.0 * n / (H * p11))
    pos = np.array([-2.2, 0.2, -8.8], np.float32)
    ch = np.float32(pcfg.camera_height)
    sp, cp = np.float32(m.sin(pitch)), np.float32(m.cos(pitch))
    # Pitched camera = pos + ch*(sy*sp, cp, cy*sp); yaw=0 -> (0, ch*cp, ch*sp).
    cam_off = np.array([0.0, ch * cp, ch * sp], np.float32)
    pos0 = pos + cam_off - np.array([0.0, ch, 0.0], np.float32)

    sheared = simp.reset(1)._replace(
        pos=jnp.array([pos], jnp.float32),
        pitch=jnp.array([pitch], jnp.float32),
        yaw=jnp.array([0.0], jnp.float32),
    )
    flat = simp.reset(1)._replace(
        pos=jnp.array([pos0], jnp.float32),
        yaw=jnp.array([0.0], jnp.float32),
    )
    i_sh, c_sh = simp.render(sheared)
    i_0, c_0 = simp.render(flat)
    a = np.asarray(i_sh[0])[n:]
    b = np.asarray(i_0[0])[: H - n]
    mismatch = (a != b).mean()
    assert mismatch <= 0.02, mismatch
    assert np.asarray(c_sh).all()  # shear keeps full coverage


def test_portal_mixed_pitch_batch(sims):
    """A batch mixing pitched and unpitched envs: each env's frame equals
    the frame it would get rendered alone (the shear path is purely
    per-env; no cross-env coupling through the batch)."""
    simj, simp = sims
    state = simp.reset(2)
    state = state._replace(
        pos=jnp.array([[-2.2, 0.2, -8.8]] * 2, jnp.float32),
        yaw=jnp.array([0.9, 0.9], jnp.float32),
        pitch=jnp.array([0.0, -0.3], jnp.float32),
    )
    ip2, _ = simp.render(state)
    for e in range(2):
        solo = jax.tree_util.tree_map(lambda x, e=e: x[e : e + 1], state)
        ip1, _ = simp.render(solo)
        np.testing.assert_array_equal(np.asarray(ip2[e]), np.asarray(ip1[0]))


def test_portal_kernel_path_matches_jnp_path():
    """raster_backend='portal_interpret' (the TPU kernel code path, run in
    interpret mode) vs 'portal_jnp' (pure-jnp fallbacks): bit-equal frames,
    including the masked/sprite merge (grate + barrel poses). The REAL
    compiled-kernel check runs on hardware via bench.py --verify."""
    simj = DoomSim(
        GameConfig(wad_file=":test:", width=64, height=40, batch_size=1,
                   raster_backend="portal_jnp", portal_crossings=12)
    )
    simk = DoomSim(
        GameConfig(wad_file=":test:", width=64, height=40, batch_size=1,
                   raster_backend="portal_interpret", portal_crossings=12)
    )
    for name, pos, yaw, time, door, lift in POSES[:2] + POSES[5:7]:
        state = simj.reset(1)
        state = state._replace(
            pos=jnp.array([pos], jnp.float32),
            yaw=jnp.array([yaw], jnp.float32),
            time=jnp.array([time], jnp.float32),
        )
        state = state._replace(
            object_offset=state.object_offset.at[0, 1].set(door).at[0, 2].set(lift)
        )
        ij, cj = simj.render(state)
        ik, ck = simk.render(state)
        np.testing.assert_array_equal(np.asarray(cj), np.asarray(ck), err_msg=name)
        np.testing.assert_array_equal(np.asarray(ij), np.asarray(ik), err_msg=name)
    # Pitched (y-shear) state: the kernels' shear terms must bit-match
    # the jnp path too.
    state = simj.reset(1)._replace(
        pos=jnp.array([[-2.2, 0.2, -8.8]], jnp.float32),
        yaw=jnp.array([0.9], jnp.float32),
        pitch=jnp.array([-0.35], jnp.float32),
    )
    ij, cj = simj.render(state)
    ik, ck = simk.render(state)
    np.testing.assert_array_equal(np.asarray(cj), np.asarray(ck), err_msg="pitch")
    np.testing.assert_array_equal(np.asarray(ij), np.asarray(ik), err_msg="pitch")


def test_portal_random_action_soak(sims, simt):
    """Random actions (including pitch-moving look) drive the portal
    render for 60 ticks. In portal_pitch='triangle' mode frames stay
    equal to the triangle oracle at every sampled tick (pitched envs go
    through the exact fallback; zero-pitch ticks may differ only within
    the pinned fp-tie budget). The default shear sim must stay finite
    and fully covered on the same trajectory."""
    simj, simp = sims
    rng = np.random.default_rng(7)
    state = simp.reset(2)
    acts = simp.null_actions(2)
    for t in range(40):
        a = acts._replace(
            movement=jnp.asarray(rng.uniform(-1, 1, (2, 2)), jnp.float32),
            look=jnp.asarray(rng.uniform(-0.08, 0.08, (2, 2)), jnp.float32),
            push=jnp.asarray(rng.random(2) < 0.1),
        )
        state = simp.step(state, a)
        if t % 20 == 19:
            ip, cp = simt.render(state)
            ij, cj = simj.render(state)
            assert np.isfinite(np.asarray(state.pos)).all()
            for e in range(2):
                same = (np.asarray(ip[e]) == np.asarray(ij[e])).mean()
                assert same >= 0.99, (t, e, same)
            ish, csh = simp.render(state)  # default shear mode
            assert np.asarray(csh).all(), t


class TestActiveSetPath:
    """The active-set (two-level) texture path for levels whose compact
    texel table exceeds the per-pixel lookup budget (VERDICT r2 #2):
    forced on the tiny level via portal_global_segs_max=0 so the gather
    kernel + per-env lookup + cbase remap run in interpret mode on CI."""

    def test_matches_jnp_oracle(self, sims):
        sima = DoomSim(
            GameConfig(wad_file=":test:", width=64, height=40, batch_size=1,
                       raster_backend="portal_interpret",
                       portal_crossings=12, portal_global_segs_max=0,
                       portal_active_segs=640)
        )
        simg = DoomSim(
            GameConfig(wad_file=":test:", width=64, height=40, batch_size=1,
                       raster_backend="portal_interpret",
                       portal_crossings=12)
        )
        simo = DoomSim(
            GameConfig(wad_file=":test:", width=64, height=40, batch_size=1,
                       raster_backend="portal_jnp", portal_crossings=12)
        )
        # Poses 0/2/3/5 are interpret-vs-jnp tie-free; flicker (9) has a
        # known 3-px fp tie under the 8-device conftest on BOTH kernel
        # paths (same boundary the pinned MISMATCH_CEILING covers), so
        # it is checked active-vs-global only (ties cancel -- the active
        # path must be bit-identical to the global kernel path).
        for i, (name, pos, yaw, time, door, lift) in enumerate(POSES):
            if i not in (0, 2, 3, 5, 9):
                continue
            state = sima.reset(1)._replace(
                pos=jnp.array([pos], jnp.float32),
                yaw=jnp.array([yaw], jnp.float32),
                time=jnp.array([time], jnp.float32),
            )
            state = state._replace(
                object_offset=state.object_offset.at[0, 1].set(door)
                .at[0, 2].set(lift)
            )
            ij, cj = sima.render(state)  # active path (interpret kernels)
            ig, cg = simg.render(state)  # global-table kernel path
            np.testing.assert_array_equal(
                np.asarray(ig), np.asarray(ij), err_msg=name
            )
            np.testing.assert_array_equal(
                np.asarray(cg), np.asarray(cj), err_msg=name
            )
            if i != 9:
                io, co = simo.render(state)
                np.testing.assert_array_equal(
                    np.asarray(io), np.asarray(ij), err_msg=name
                )
                np.testing.assert_array_equal(
                    np.asarray(co), np.asarray(cj), err_msg=name
                )

    def test_overflow_falls_back_to_triangle(self, sims):
        simj, _ = sims
        simo = DoomSim(
            GameConfig(wad_file=":test:", width=W, height=H, batch_size=1,
                       raster_backend="portal_interpret",
                       portal_crossings=12, portal_global_segs_max=0,
                       portal_active_segs=8)
        )
        state = simj.reset(1)._replace(
            pos=jnp.array([[-2.2, 0.2, -8.8]], jnp.float32),
            yaw=jnp.array([0.9], jnp.float32),
        )
        io, co = simo.render(state)
        it, ct = simj.render(state)  # triangle oracle
        np.testing.assert_array_equal(np.asarray(io), np.asarray(it))
        np.testing.assert_array_equal(np.asarray(co), np.asarray(ct))


class TestTexStress:
    """Real texel VOLUME engages the active-set path naturally (VERDICT
    r2 #2): the :texstress: fixture's texture pool pushes the compact
    table past portal_global_segs_max with NO forced cap, and the kernel
    path must still match the jnp oracle."""

    def test_overflow_gather_meta_stays_in_bounds(self):
        """Active-budget OVERFLOW must clamp the gather meta: the gather
        kernel runs on every env (the triangle fallback replaces pixels
        afterwards), so an overflowing env's slot offsets must still land
        inside the (active_segs + 8)-row output buffer. Unclamped offsets
        are out-of-bounds VMEM stores -- the r4 worker-fault bug that
        interpret mode never catches. Render must also still complete and
        match the oracle (through the fallback)."""
        import dataclasses

        wad = ":texstress:6x32"
        act = 64  # far below any real view's need -> every env overflows
        cfgk = GameConfig(wad_file=wad, width=48, height=32, batch_size=1,
                          raster_backend="portal_interpret",
                          portal_crossings=12, portal_active_segs=act,
                          portal_global_segs_max=1024)
        simk = DoomSim(cfgk)
        state = simk.reset(1)
        # Pin the in-bounds invariant on the meta itself.
        from tpu_doom.render.portal import _walk_env

        _, _, aux = jax.vmap(
            lambda p, y, pi, o, t: _walk_env(
                simk._get_portal_scene(), simk.scene, cfgk, 48, 32, 12,
                p, y, pi, o, t, active_segs=act,
            )
        )(state.pos, state.yaw, state.pitch, state.object_offset,
          state.time)
        meta = np.asarray(aux["gather_meta"])  # (B, C, 3) block units
        assert bool(np.asarray(aux["overflow"]).all())
        end_rows = (meta[..., 1] + meta[..., 2]) * 8
        assert end_rows.max() <= act, end_rows.max()
        assert (meta[..., 2] >= 0).all()
        # End-to-end: every env falls back, so the render must equal the
        # triangle oracle exactly (fallback pixels replace the walk's).
        simj = DoomSim(dataclasses.replace(cfgk, raster_backend="jnp"))
        ik, ck = simk.render(state)
        ij, cj = simj.render(state)
        np.testing.assert_array_equal(np.asarray(ik), np.asarray(ij))
        np.testing.assert_array_equal(np.asarray(ck), np.asarray(cj))

    def test_table_exceeds_cap_and_matches_oracle(self):
        import dataclasses

        wad = ":texstress:6x32"
        # Cap forced down: since the r5 default cap raise (12288), the
        # fixture's table fits the global path, so the ACTIVE path under
        # test needs the cap override (production selects it only for
        # beyond-VMEM tables).
        cfgk = GameConfig(wad_file=wad, width=48, height=32, batch_size=1,
                          raster_backend="portal_interpret",
                          portal_crossings=12, portal_global_segs_max=1024)
        simk = DoomSim(cfgk)
        pt = simk._get_portal_scene()
        # The pool makes the table genuinely exceed the global-path cap.
        assert pt["tex_i8"].shape[0] > cfgk.portal_global_segs_max
        assert "tex_full" in pt  # active-set tables were built
        simj = DoomSim(dataclasses.replace(cfgk, raster_backend="portal_jnp"))
        state = simk.reset(1)
        for yaw in (0.0, 2.2):
            st = state._replace(yaw=jnp.array([yaw], jnp.float32))
            ik, ck = simk.render(st)
            ij, cj = simj.render(st)
            # Absolute fp-tie budget, not a fraction: tie pixels live on
            # span boundaries, whose count scales with EDGES (~linear),
            # so a fixed ratio over-fails small frames (7 tie px at
            # 48x32 was 0.995). The strong gate is the hardware verify
            # leg at 320x200 (<=16 px over 8 poses).
            mm = int((np.asarray(ik) != np.asarray(ij)).sum())
            assert mm <= 8, (yaw, mm)
            np.testing.assert_array_equal(np.asarray(ck), np.asarray(cj))


def test_rolled_classify_matches_unrolled(monkeypatch):
    """The fused kernel ROLLS its classify loop (lax.fori_loop over
    crossings) above ROLL_CLASSIFY_ABOVE records -- the fully unrolled
    program at n_rec=120 (portal_compact_crossings=24, needed for deep
    real-WAD corridors) crashed the TPU worker at launch in r4. The two
    variants share one record body, so they must be BIT-equal. Exercised
    cheaply: force the threshold down so the :test: fixture's n_rec=20
    (kc=4) takes the rolled path, and diff against the unrolled render
    at identical config (masked-grate pose included: the words_ref
    dynamic-k indexing is the riskiest lowering)."""
    import dataclasses

    import tpu_doom.ops.raster_pallas as rp

    cfg = GameConfig(wad_file=":test:", width=64, height=40, batch_size=1,
                     raster_backend="portal_interpret",
                     portal_crossings=12, portal_compact_crossings=4)
    sim = DoomSim(cfg)
    states = []
    for i in (0, 5):  # walls / grate(masked) poses
        name, pos, yaw, time, door, lift = POSES[i]
        st = sim.reset(1)._replace(
            pos=jnp.array([pos], jnp.float32),
            yaw=jnp.array([yaw], jnp.float32),
            time=jnp.array([time], jnp.float32),
        )
        st = st._replace(
            object_offset=st.object_offset.at[0, 1].set(door)
            .at[0, 2].set(lift)
        )
        states.append((name, st))
    unrolled = [(n, sim.render(s)) for n, s in states]
    monkeypatch.setattr(rp, "ROLL_CLASSIFY_ABOVE", 8)  # n_rec=20 rolls
    jax.clear_caches()  # the threshold is read at trace time
    try:
        for (name, st), (_, (iu, cu)) in zip(states, unrolled):
            ir, cr = sim.render(st)
            np.testing.assert_array_equal(np.asarray(ir), np.asarray(iu),
                                          err_msg=name)
            np.testing.assert_array_equal(np.asarray(cr), np.asarray(cu),
                                          err_msg=name)
    finally:
        jax.clear_caches()  # drop the low-threshold kernels


def test_gated_global_i8_lookup_matches_ungated():
    """ADVICE r3: the SMEM-planned gated int8 GLOBAL-table lookup
    (gated=True with per_env_tex=False, raster_pallas.py) engages only
    when the global compact table has nb>=8 blocks (897-1024 segs) --
    no small fixture reaches it naturally. Pad the :test: fixture's
    table with dead rows to exactly 1024 segs: lookups are unchanged
    (live indices stay in the unmoved prefix; plan blocks covering the
    dead region never gate on), so the gated render must be bit-equal
    to the ungated one."""
    import dataclasses

    cfg = GameConfig(wad_file=":test:", width=64, height=40, batch_size=1,
                     raster_backend="portal_interpret",
                     portal_crossings=12)
    sim_ref = DoomSim(cfg)
    sim_gated = DoomSim(dataclasses.replace(cfg))
    ps = sim_gated._get_portal_scene()
    s1 = ps["tex_i8"].shape[0]
    assert s1 <= 896, "fixture grew past the ungated range; rethink"
    ps["tex_i8"] = jnp.pad(
        ps["tex_i8"], ((0, 1024 - s1), (0, 0)), constant_values=-128
    )
    for i in (0, 5):  # walls / grate(masked) poses
        name, pos, yaw, time, door, lift = POSES[i]
        state = sim_ref.reset(1)._replace(
            pos=jnp.array([pos], jnp.float32),
            yaw=jnp.array([yaw], jnp.float32),
            time=jnp.array([time], jnp.float32),
        )
        state = state._replace(
            object_offset=state.object_offset.at[0, 1].set(door)
            .at[0, 2].set(lift)
        )
        ir, cr = sim_ref.render(state)
        ig, cg = sim_gated.render(state)
        np.testing.assert_array_equal(np.asarray(ir), np.asarray(ig),
                                      err_msg=name)
        np.testing.assert_array_equal(np.asarray(cr), np.asarray(cg),
                                      err_msg=name)


def test_portal_kernel_odd_height_padding():
    """Heights that are not a multiple of the kernel h-tile (32) pad the
    tile grid; padded rows must not leak into the frame. 24 rows -> 1
    tile with 8 padded rows (tile_h AUTO resolves to 32 since 24 % 40
    != 0)."""
    simj = DoomSim(
        GameConfig(wad_file=":test:", width=64, height=24, batch_size=1,
                   raster_backend="portal_jnp", portal_crossings=12)
    )
    simk = DoomSim(
        GameConfig(wad_file=":test:", width=64, height=24, batch_size=1,
                   raster_backend="portal_interpret", portal_crossings=12)
    )
    state = simj.reset(1)
    state = state._replace(yaw=jnp.array([0.9], jnp.float32))
    ij, cj = simj.render(state)
    ik, ck = simk.render(state)
    np.testing.assert_array_equal(np.asarray(ij), np.asarray(ik))
    np.testing.assert_array_equal(np.asarray(cj), np.asarray(ck))


class TestEnvChunkedRender:
    def test_chunked_equals_unchunked(self):
        """render_env_chunk slicing must be invisible: frames from a
        chunked render equal the single-dispatch render exactly."""
        import dataclasses

        from tpu_doom.models import DoomSim

        cfg = GameConfig(wad_file=":test:", width=48, height=32,
                         batch_size=5, raster_backend="portal_jnp",
                         portal_crossings=10, render_env_chunk=0)
        sim = DoomSim(cfg)
        state = sim.reset(5)
        state = state._replace(
            yaw=jnp.linspace(0.0, 2.0, 5),
            pos=state.pos + jnp.linspace(0.0, 0.5, 5)[:, None]
            * jnp.array([1.0, 0.0, 0.0]),
        )
        base, base_cov = sim.render(state)
        # chunk 2 over batch 5: slicing AND the tail-padding path in one
        # compile (3 chunks, last padded).
        c_cfg = dataclasses.replace(cfg, render_env_chunk=2)
        c_sim = DoomSim.__new__(DoomSim)
        c_sim.__dict__.update(sim.__dict__)
        c_sim.config = c_cfg
        idx, cov = c_sim.render(state)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(base))
        np.testing.assert_array_equal(np.asarray(cov), np.asarray(base_cov))

    def test_nested_group_scan(self, monkeypatch):
        """More chunks than the group unroll takes the outer lax.scan
        path; frames must still equal the unchunked render. GROUP_UNROLL
        is monkeypatched down so the multi-group path compiles a 4-body
        program instead of 32 (same code path, minutes cheaper on the
        single-core CI host)."""
        import dataclasses

        import tpu_doom.render as render_mod
        from tpu_doom.models import DoomSim

        monkeypatch.setattr(render_mod, "GROUP_UNROLL", 4)
        jax.clear_caches()  # the unroll width is read at trace time
        try:
            cfg = GameConfig(wad_file=":test:", width=16, height=12,
                             batch_size=19, raster_backend="portal_jnp",
                             portal_crossings=6, render_env_chunk=0)
            sim = DoomSim(cfg)
            state = sim.reset(19)
            state = state._replace(yaw=jnp.linspace(0.0, 3.0, 19))
            base, base_cov = sim.render(state)
            c_sim = DoomSim.__new__(DoomSim)
            c_sim.__dict__.update(sim.__dict__)
            # 19 envs / 2 = 10 chunks -> 3 groups of 4 (scan) + padding.
            c_sim.config = dataclasses.replace(cfg, render_env_chunk=2)
            idx, cov = c_sim.render(state)
            np.testing.assert_array_equal(np.asarray(idx), np.asarray(base))
            np.testing.assert_array_equal(
                np.asarray(cov), np.asarray(base_cov))
        finally:
            jax.clear_caches()  # drop the narrow-unroll programs


class TestStressScene:
    def test_portal_matches_triangle_on_stress_maze(self):
        """Dense many-sector procedural maze (real-WAD scale): the portal
        path at the default crossing budget must match the triangle
        oracle on >= 99% of pixels per pose (fp ties only)."""
        from tpu_doom.models import DoomSim

        # 10x10 cells: still a many-sector maze (100 rooms, hundreds of
        # linedefs) at a quarter of the 20x20 table sizes -- wall-time
        # budget, same code paths (r3 suite grew to 36m; VERDICT #6).
        cfg = GameConfig(wad_file=":stress:10", width=80, height=50,
                         batch_size=3, raster_backend="portal_jnp",
                         portal_crossings=24, render_env_chunk=0)
        sim = DoomSim(cfg)
        state = sim.reset(3)
        state = state._replace(yaw=jnp.array([0.0, 1.2, 2.5]))
        idx_p, cov_p = sim.render(state)

        import dataclasses

        t_sim = DoomSim.__new__(DoomSim)
        t_sim.__dict__.update(sim.__dict__)
        t_sim.config = dataclasses.replace(cfg, raster_backend="jnp")
        t_sim._portal_scene = None
        idx_t, cov_t = t_sim.render(state)
        same = (np.asarray(idx_p) == np.asarray(idx_t)).mean(axis=(1, 2))
        assert (same >= 0.99).all(), same

    def test_kernel_path_on_stress_maze(self):
        """The fused Pallas kernel path (portal_interpret) at the DEFAULT
        crossing budget on the many-sector maze: bit-equal to portal_jnp,
        exercising the compaction-overflow lax.cond + classify-plan
        gating at real-WAD sector scale (VERDICT r2 #8)."""
        from tpu_doom.models import DoomSim

        # 10x10 maze + 64x40: the compaction-overflow cond + classify
        # plan still engage; interpret-mode cost scales with pixels x
        # records, so the smaller frame buys most of the wall time back.
        cfg = GameConfig(wad_file=":stress:10", width=64, height=40,
                         batch_size=2, raster_backend="portal_jnp",
                         render_env_chunk=0)
        sim = DoomSim(cfg)
        state = sim.reset(2)
        state = state._replace(yaw=jnp.array([0.7, 2.5]))
        idx_j, cov_j = sim.render(state)

        import dataclasses

        k_sim = DoomSim.__new__(DoomSim)
        k_sim.__dict__.update(sim.__dict__)
        k_sim.config = dataclasses.replace(
            cfg, raster_backend="portal_interpret")
        idx_k, cov_k = k_sim.render(state)
        np.testing.assert_array_equal(np.asarray(cov_j), np.asarray(cov_k))
        np.testing.assert_array_equal(np.asarray(idx_j), np.asarray(idx_k))
