from mvtracker_tpu.evaluation import metrics

__all__ = ["metrics"]
