"""Pallas TPU kernels for the hot dense ops (lane-major point layouts)."""

from . import dense_contact, tactile_query  # noqa: F401
