from tubedetr_tpu.models.tubedetr import TubeDETR, build_model  # noqa: F401
