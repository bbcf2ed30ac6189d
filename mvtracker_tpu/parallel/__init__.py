from mvtracker_tpu.parallel import mesh

__all__ = ["mesh"]
