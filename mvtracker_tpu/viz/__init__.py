from mvtracker_tpu.viz import mp4

__all__ = ["mp4"]
