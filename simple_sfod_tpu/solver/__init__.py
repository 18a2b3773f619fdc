from .build import build_optimizer, warmup_multistep_schedule

__all__ = ["build_optimizer", "warmup_multistep_schedule"]
