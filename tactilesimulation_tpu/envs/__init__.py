"""Env registry — functional analogue of the reference gym registration
(envs/__init__.py: StableGrasp-v1, TactilePush-v1, TactileRotation-v1,
Insertion-v3, with max_episode_steps 10/100/200/15)."""

from __future__ import annotations

_REGISTRY = {}


def register(name, factory, max_episode_steps):
    _REGISTRY[name] = (factory, max_episode_steps)


def make(name, **kwargs):
    """Create a functional env by registry id."""
    factory, max_steps = _REGISTRY[name]
    env = factory(**kwargs)
    env.max_episode_steps = max_steps
    return env


def _push(**kw):
    from . import tactile_push
    return tactile_push.make(**kw)


def _grasp(**kw):
    from . import stable_grasp
    return stable_grasp.make(**kw)


def _rotate(**kw):
    from . import dclaw_rotate
    return dclaw_rotate.make(**kw)


def _insert(**kw):
    from . import tactile_insertion
    return tactile_insertion.make(**kw)


register("StableGrasp-v1", _grasp, 10)
register("TactilePush-v1", _push, 100)
register("TactileRotation-v1", _rotate, 200)
register("Insertion-v3", _insert, 15)
