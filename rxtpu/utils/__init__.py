from rxtpu.utils.profiling import trace, profile_step_loop  # noqa: F401
