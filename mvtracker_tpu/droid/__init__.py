from mvtracker_tpu.droid import transforms, gripper, pipeline

__all__ = ["transforms", "gripper", "pipeline"]
