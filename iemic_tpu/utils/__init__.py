from .logging import (  # noqa: F401
    INFO,
    WARNING,
    ERROR,
    timer,
    timer_start,
    timer_stop,
    track_iterations,
    print_profile,
    profile_table,
    reset_profile,
    write_cdata,
    set_cdata_file,
)
