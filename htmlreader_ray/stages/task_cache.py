"""Per-worker-process instance cache for callable-class stages.

Lets compiled-state stages (selector rule-sets, LSH parameters, codecs) run
as map_batches TASKS — fused with neighbors and free of actor-pool spin-up
per pipeline execution — while keeping init-once-per-worker semantics.
Use real actor pools only for state too heavy to share (models) or state
that must not outlive a pipeline.
"""

from __future__ import annotations

_WORKER_INSTANCES: dict = {}


def as_task(cls, **kwargs):
    """Wrap a callable-class stage as a task fn with a per-worker instance
    (keyed by class + constructor kwargs)."""
    key = (cls, tuple(sorted(kwargs.items())))

    def fn(batch, _key=key, _cls=cls, _kw=kwargs):
        inst = _WORKER_INSTANCES.get(_key)
        if inst is None:
            inst = _WORKER_INSTANCES[_key] = _cls(**_kw)
        return inst(batch)
    fn.__name__ = f"task_{cls.__name__}"
    return fn
