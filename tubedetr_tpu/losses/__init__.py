from tubedetr_tpu.losses.criterion import SetCriterion  # noqa: F401
