from .engine import Engine, EngineConfig
from .kv_cache import KVCache
from .sampler import SamplingParams, sample


def __getattr__(name):
    # lazy: scheduler/serve pull in the parallel layer for TPEngine support
    if name in ("Scheduler", "Request"):
        from . import scheduler

        return getattr(scheduler, name)
    if name == "serve":
        from .serving import serve

        return serve
    if name == "SpecDecoder":
        from .speculative import SpecDecoder

        return SpecDecoder
    raise AttributeError(name)


__all__ = [
    "Engine", "EngineConfig", "KVCache", "SamplingParams", "sample",
    "Scheduler", "Request", "serve", "SpecDecoder",
]
