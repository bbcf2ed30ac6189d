from mvtracker_tpu.ops import knn, corr

__all__ = ["knn", "corr"]
