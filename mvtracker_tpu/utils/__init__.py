from mvtracker_tpu.utils import geometry, embeddings

__all__ = ["geometry", "embeddings"]
