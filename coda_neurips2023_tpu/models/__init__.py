"""Model zoo.

Mirrors the reference registry (/root/reference/models/__init__.py:3-12):
only two model names are wired in the shipped configs:
  * "3detrmulticlasshead"            -> baseline / closed-vocab eval head
  * "3detr_predictedbox_distillation" -> the CoDA model (CLIP distillation)
"""

from coda_neurips2023_tpu.models.model_3detr import (
    build_3detr_multiclasshead,
    build_3detr_predictedbox_distillation_head,
)

MODEL_FUNCS = {
    "3detrmulticlasshead": build_3detr_multiclasshead,
    "3detr_predictedbox_distillation": build_3detr_predictedbox_distillation_head,
}


def build_model(args, dataset_config):
    return MODEL_FUNCS[args.model_name](args, dataset_config)
