from maed_tpu.models.maed import MAED
