from tubedetr_tpu.core import boxes, embeddings, masking  # noqa: F401
