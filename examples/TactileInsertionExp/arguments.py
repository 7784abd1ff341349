"""Argument parsers for the TactileInsertion experiments — surface parity
with the reference examples/TactileInsertionExp/arguments.py (P23).

Implementation is shared in tactilesimulation_tpu.utils.config.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "../.."))

from tactilesimulation_tpu.utils.config import (  # noqa: E402,F401
    get_base_parser,
    get_gd_parser,
    get_rl_parser,
)
