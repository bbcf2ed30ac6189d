from mvtracker_tpu.datasets import datapoint, synthetic

__all__ = ["datapoint", "synthetic"]
