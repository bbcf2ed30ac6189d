from mvtracker_tpu.models import encoder, updateformer, mvtracker

__all__ = ["encoder", "updateformer", "mvtracker"]
