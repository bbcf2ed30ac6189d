from mvtracker_tpu.training import losses

__all__ = ["losses"]
