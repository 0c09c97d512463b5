from .tail import LogFile, list_log_files, pending_files, plan_epoch  # noqa: F401
