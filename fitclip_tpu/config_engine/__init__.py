from fitclip_tpu.config_engine.compose import compose, expand_multirun
from fitclip_tpu.config_engine.instantiate import instantiate

__all__ = ["compose", "expand_multirun", "instantiate"]
