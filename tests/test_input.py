"""Input gestures, mouse look, and HUD overlay (ref engine/src/input.rs,
game/src/hud.rs, engine/src/text.rs; VERDICT r1 item 10)."""

import numpy as np

from tpu_doom.utils.input import (
    AllOf,
    Bindings,
    InputState,
    KeyHold,
    KeyTrigger,
    QuitTrigger,
    poll_actions,
)
from tpu_doom.utils.text import draw_hud
from tpu_doom.utils.viewer import parse_sgr_mouse


class TestGestures:
    def test_key_trigger_edge_detection(self):
        """KeyTrigger fires only on the update it was pressed
        (input.rs:86-89, 131-134)."""
        inp = InputState()
        b = Bindings()
        inp.key_down("e")
        assert inp.poll_gesture(b.push)
        inp.advance()
        assert not inp.poll_gesture(b.push)  # still held, but not an edge
        inp.key_up("e")
        inp.key_down("e")
        assert inp.poll_gesture(b.push)

    def test_key_hold(self):
        inp = InputState()
        b = Bindings()
        inp.key_down("w")
        for _ in range(3):
            acts = poll_actions(inp, b, batch=2)
            assert acts.movement.shape == (2, 2)
            assert float(acts.movement[0, 1]) == -1.0  # forward
            inp.advance()

    def test_allof_chord(self):
        inp = InputState()
        b = Bindings()
        inp.key_down("n")
        assert not inp.poll_gesture(b.next_level)  # no ctrl
        inp.key_down("lcontrol")
        assert inp.poll_gesture(b.next_level)

    def test_quit_trigger(self):
        inp = InputState()
        b = Bindings()
        inp.quit_requested()
        assert inp.poll_gesture(b.quit)
        inp.advance()
        assert not inp.poll_gesture(b.quit)


class TestMouseLook:
    def test_mouse_motion_feeds_look(self):
        """MouseAnalog (input.rs Analog2d::Mouse) contributes to the look
        action through the SumAnalog binding."""
        inp = InputState()
        b = Bindings()
        inp.mouse_motion(100.0, -40.0)
        acts = poll_actions(inp, b, batch=1)
        assert float(acts.look[0, 0]) == np.float32(100.0 * 0.0015)
        assert float(acts.look[0, 1]) == np.float32(-40.0 * 0.0015)
        inp.advance()  # deltas reset each tick
        acts = poll_actions(inp, b, batch=1)
        assert float(np.abs(np.asarray(acts.look)).max()) == 0.0

    def test_parse_sgr_mouse(self):
        # Motion report (button 35 = no-button + motion bit).
        assert parse_sgr_mouse("35;10;5M") == (None, 10, 5, True)
        # Left-button press / release.
        assert parse_sgr_mouse("0;3;4M") == (0, 3, 4, True)
        assert parse_sgr_mouse("0;3;4m") == (0, 3, 4, False)
        # Garbage.
        assert parse_sgr_mouse("") is None
        assert parse_sgr_mouse("1;2") is None
        assert parse_sgr_mouse("x;y;zM") is None

    def test_click_fires_shoot(self):
        inp = InputState()
        b = Bindings()
        inp.button_down(0)
        acts = poll_actions(inp, b, batch=1)
        assert bool(acts.shoot[0])
        inp.advance()
        acts = poll_actions(inp, b, batch=1)
        assert not bool(acts.shoot[0])


class TestHud:
    def test_hud_stamps_text(self):
        rgb = np.zeros((80, 120, 3), np.uint8)
        draw_hud(rgb, level_name="E1M1", fps=30.0, show_help=False)
        assert rgb.any()  # status line stamped

    def test_help_overlay_toggles(self):
        """The help overlay (ref game/src/hud.rs:143-156) adds text rows
        beyond the status line."""
        base = np.zeros((80, 120, 3), np.uint8)
        no_help = base.copy()
        with_help = base.copy()
        draw_hud(no_help, level_name="E1M1", fps=0.0, show_help=False)
        draw_hud(with_help, level_name="E1M1", fps=0.0, show_help=True)
        assert (with_help != no_help).any()
        assert with_help.any(axis=(1, 2)).sum() > no_help.any(axis=(1, 2)).sum()
