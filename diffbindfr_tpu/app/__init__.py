from . import export, jobs, pipeline

__all__ = ["export", "jobs", "pipeline"]
