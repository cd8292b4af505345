from .manifest import PipelineManifest, StageRecord

__all__ = ["PipelineManifest", "StageRecord"]
