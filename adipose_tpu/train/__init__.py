from adipose_tpu.train import checkpoint, ema, schedules, state

__all__ = ["checkpoint", "ema", "schedules", "state"]
