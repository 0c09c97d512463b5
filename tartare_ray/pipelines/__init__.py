from .cdc import CdcEngine, EngineConfig  # noqa: F401
