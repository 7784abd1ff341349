"""RollingBall sim-speed benchmark — drop-in layout parity with the reference
entry point (examples/RollingBallExp/test_sim_speed.py): sphere rolling on a
200x200-marker tactile pad, 350 steps of piecewise-constant forces, tactile
queried every 5 steps, wall-clock FPS printed at the end.

The implementation lives in examples/rolling_ball_speed.py (shared with the
top-level quick-start); this shim keeps the reference's per-experiment folder
layout so reference users find the benchmark where they expect it.

Run: python test_sim_speed.py [--steps 350] [--batch B] [--cpu] [--f64]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from rolling_ball_speed import main  # noqa: E402

if __name__ == "__main__":
    main()
