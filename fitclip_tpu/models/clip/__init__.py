from fitclip_tpu.models.clip.model import CLIPConfig, CLIPModel, TextConfig, VisionConfig

__all__ = ["CLIPConfig", "CLIPModel", "TextConfig", "VisionConfig"]
