from .build import auto_scale_workers, build_optimizer, warmup_multistep_schedule

__all__ = ["auto_scale_workers", "build_optimizer", "warmup_multistep_schedule"]
