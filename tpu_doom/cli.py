"""Command-line interface.

Reference: src/main.rs (rs_doom binary): flags -i/--iwad, -m/--metadata,
-r/--resolution, -l/--level, -f/--fov; subcommands `check` and
`list-levels`. Added batch/TPU-native subcommands: `bench`, `demo`
(render screenshots to disk), and `run` (headless scripted ticks with the
FrameTimers 1 Hz summary). Use `--iwad :test:` for the synthetic fixture
IWAD (no WAD ships with this repo).
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
import time
import zlib
import struct

import numpy as np

log = logging.getLogger("tpu_doom")


def parse_resolution(text: str) -> tuple[int, int]:
    """WIDTHxHEIGHT (ref main.rs:141-162)."""
    try:
        w, h = text.split("x", 1)
        return int(w), int(h)
    except ValueError:
        raise argparse.ArgumentTypeError("resolution format must be WIDTHxHEIGHT")


def write_png(path: str, rgb: np.ndarray):
    """Minimal PNG writer (no imaging deps in the environment)."""
    h, w, _ = rgb.shape

    def chunk(tag, data):
        c = tag + data
        return struct.pack(">I", len(data)) + c + struct.pack(">I", zlib.crc32(c))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    rows = b"".join(b"\x00" + rgb[r].tobytes() for r in range(h))
    with open(path, "wb") as f:
        f.write(
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(rows))
            + chunk(b"IEND", b"")
        )


def build_parser() -> argparse.ArgumentParser:
    from . import __version__

    p = argparse.ArgumentParser(prog="tpu-doom", description=__doc__)
    p.add_argument("--version", action="version", version=f"tpu-doom {__version__}")
    p.add_argument("-i", "--iwad", default="doom1.wad", help="IWAD file (':test:' = synthetic)")
    p.add_argument("-m", "--metadata", default="assets/meta/doom.toml")
    p.add_argument(
        "-r", "--resolution", type=parse_resolution, default=(1280, 720),
        metavar="WIDTHxHEIGHT",
    )
    p.add_argument("-l", "--level", type=int, default=0)
    p.add_argument("-f", "--fov", type=float, default=65.0)
    p.add_argument("-b", "--batch", type=int, default=1)
    p.add_argument(
        "--backend",
        default="auto",
        choices=["auto", "jnp", "pallas", "pallas_interpret", "portal",
                 "portal_jnp", "portal_interpret"],
        help="rasterizer backend (GameConfig.raster_backend)",
    )
    sub = p.add_subparsers(dest="command")
    sub.add_parser("check", help="load metadata and all levels, then exit")
    sub.add_parser("list-levels", help="list level names and indices")
    demo = sub.add_parser("demo", help="render a short scripted flythrough to PNGs")
    demo.add_argument("--ticks", type=int, default=120)
    demo.add_argument("--every", type=int, default=30)
    demo.add_argument("--out", default="/tmp/tpu_doom_demo")
    runp = sub.add_parser("run", help="headless scripted ticks with timers")
    runp.add_argument("--ticks", type=int, default=600)
    playp = sub.add_parser("play", help="interactive ANSI terminal viewer")
    playp.add_argument("--fps", type=float, default=15.0)
    bench = sub.add_parser("bench", help="step+render throughput benchmark")
    bench.add_argument("--ticks", type=int, default=64)
    bench.add_argument("--warmup", type=int, default=8)
    bench.add_argument("--json", action="store_true")
    dump = sub.add_parser(
        "dump-frames",
        help="reference-parity kit: palette-index frames along a fixed "
        "deterministic camera path (see PARITY.md for the recipe to "
        "capture the same path from the reference build)",
    )
    dump.add_argument("--ticks", type=int, default=300)
    dump.add_argument("--every", type=int, default=10)
    dump.add_argument("--out", default="/tmp/tpu_doom_frames")
    dump.add_argument("--png", action="store_true",
                      help="also write RGB PNGs next to the .npy frames")
    return p


def make_sim(args):
    from .models import DoomSim
    from .utils.config import GameConfig

    cfg = GameConfig(
        wad_file=args.iwad,
        metadata_file=args.metadata,
        fov=args.fov,
        width=args.resolution[0],
        height=args.resolution[1],
        initial_level_index=args.level,
        batch_size=args.batch,
        raster_backend=args.backend,
    )
    return DoomSim(cfg)


def scripted_actions(sim, state, t):
    """A simple deterministic pilot: walk forward, sweep the view, push."""
    import jax.numpy as jnp

    b = state.pos.shape[0]
    acts = sim.null_actions(b)
    phase = (t // 90) % 4
    fwd = -1.0 if phase in (0, 2) else 0.0
    turn = 0.02 if phase in (1, 3) else 0.0
    return acts._replace(
        movement=jnp.tile(jnp.array([[0.0, fwd]], jnp.float32), (b, 1)),
        look=jnp.tile(jnp.array([[turn, 0.0]], jnp.float32), (b, 1)),
        push=jnp.full((b,), t % 35 == 0),
    )


def cmd_check(args) -> int:
    sim = make_sim(args)
    elapsed = sim.check()
    log.info("done loading all %d levels in %.4fs", sim.num_levels, elapsed)
    return 0


def cmd_list_levels(args) -> int:
    from .wad.archive import Archive

    if args.iwad == ":test:":
        from .wad.wadgen import build_test_wad

        wad = Archive(build_test_wad(), source=":test:")
    else:
        wad = Archive.open(args.iwad)
    for i in range(wad.num_levels):
        print(f"{i:3} {wad.level_name(i).rstrip(b'\\0').decode('ascii', 'replace'):8}")
    return 0


def cmd_demo(args) -> int:
    import os

    sim = make_sim(args)
    os.makedirs(args.out, exist_ok=True)
    state = sim.reset(args.batch)
    for t in range(args.ticks):
        state = sim.step(state, scripted_actions(sim, state, t))
        if t % args.every == 0:
            rgb = sim.render_rgb(state)
            write_png(f"{args.out}/frame_{t:05d}.png", rgb[0])
            log.info("wrote %s/frame_%05d.png", args.out, t)
    return 0


def cmd_run(args) -> int:
    from .utils.timers import FrameTimers

    sim = make_sim(args)
    state = sim.reset(args.batch)
    timers = FrameTimers()
    for t in range(args.ticks):
        with timers.time("tick"):
            state = sim.step(state, scripted_actions(sim, state, t))
        with timers.time("frame"):
            idx, cov = sim.render(state)
            idx.block_until_ready()
        timers.maybe_log()
    pos = np.asarray(state.pos[0])
    log.info("final player pos env0: %s", pos)
    return 0


def cmd_play(args) -> int:
    from .utils.viewer import play

    sim = make_sim(args)
    w = min(args.resolution[0], 200)
    h = min(args.resolution[1], 120)
    play(sim, fps=args.fps, width=w, height=h)
    return 0


def cmd_bench(args) -> int:
    import jax

    def _sync(tree):
        leaf = jax.tree_util.tree_leaves(tree)[0]
        return np.asarray(leaf.ravel()[0:1])

    sim = make_sim(args)
    state = sim.reset(args.batch)
    acts = sim.null_actions(args.batch)
    b = args.batch

    def tick(s):
        s, idx, _ = sim.step_render(s, acts)
        return s, idx

    # Warmup/compile.
    for _ in range(args.warmup):
        state, idx = tick(state)
    _sync((state, idx))
    t0 = time.perf_counter()
    for _ in range(args.ticks):
        state, idx = tick(state)
    _sync((state, idx))
    dt = time.perf_counter() - t0
    fps = b * args.ticks / dt
    result = {
        "metric": "step+render FPS/chip",
        "value": round(fps, 1),
        "unit": "env*frames/s",
        "vs_baseline": round(fps / 10000.0, 4),
        "batch": b,
        "resolution": f"{sim.config.width}x{sim.config.height}",
    }
    print(json.dumps(result))
    return 0


def cmd_dump_frames(args) -> int:
    """Reference-parity kit (PARITY.md): run the deterministic scripted
    pilot from the level start and dump palette-index frames + the exact
    camera state per dump, so the same path can be replayed against the
    reference renderer when a real WAD/GL environment exists."""
    import os

    sim = make_sim(args)
    os.makedirs(args.out, exist_ok=True)
    state = sim.reset(args.batch)
    manifest = {
        "iwad": args.iwad,
        "level": args.level,
        "resolution": list(args.resolution),
        "fov": args.fov,
        "ticks": args.ticks,
        "every": args.every,
        "pilot": "scripted_actions (cli.py): phase = (t//90)%4; "
                 "fwd=-1 in phases 0/2, turn +0.02 rad/tick in 1/3, "
                 "push every 35 ticks",
        "frames": [],
    }
    for t in range(args.ticks):
        state = sim.step(state, scripted_actions(sim, state, t))
        if t % args.every != 0:
            continue
        idx, cov = sim.render(state)
        frame = np.asarray(idx[0])
        np.save(f"{args.out}/frame_{t:05d}.npy", frame)
        if args.png:
            rgb = sim.render_rgb(state)
            write_png(f"{args.out}/frame_{t:05d}.png", rgb[0])
        manifest["frames"].append(
            {
                "tick": t + 1,
                "file": f"frame_{t:05d}.npy",
                "pos": [float(x) for x in np.asarray(state.pos[0])],
                "yaw": float(state.yaw[0]),
                "pitch": float(state.pitch[0]),
                "time": float(state.time[0]),
            }
        )
    with open(f"{args.out}/manifest.json", "w") as f:
        json.dump(manifest, f, indent=1)
    log.info("wrote %d frames + manifest.json to %s", len(manifest["frames"]), args.out)
    return 0


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO, format="%(levelname)s %(name)s: %(message)s")
    import os

    if os.environ.get("JAX_PLATFORMS"):
        # Some PJRT plugins register themselves regardless of JAX_PLATFORMS;
        # re-assert the user's choice through jax.config, which is honored.
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    args = build_parser().parse_args(argv)
    if args.command == "check":
        return cmd_check(args)
    if args.command == "list-levels":
        return cmd_list_levels(args)
    if args.command == "demo":
        return cmd_demo(args)
    if args.command == "run":
        return cmd_run(args)
    if args.command == "play":
        return cmd_play(args)
    if args.command == "bench":
        return cmd_bench(args)
    if args.command == "dump-frames":
        return cmd_dump_frames(args)
    # Default (no subcommand): headless run (no display in this environment).
    return cmd_run(argparse.Namespace(**{**vars(args), "ticks": 600}))


if __name__ == "__main__":
    sys.exit(main())
