from unet_bssfp_tpu.utils.profiling import StepTimer, trace
from unet_bssfp_tpu.utils.debug import enable_nan_checks, checkify_fn
from unet_bssfp_tpu.utils.watchdog import run_with_watchdog, WatchdogResult

__all__ = [
    "StepTimer", "trace", "enable_nan_checks", "checkify_fn",
    "run_with_watchdog", "WatchdogResult",
]
