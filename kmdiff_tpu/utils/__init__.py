from kmdiff_tpu.utils.exceptions import *  # noqa: F401,F403
from kmdiff_tpu.utils.timer import Timer  # noqa: F401
from kmdiff_tpu.utils.logging import set_verbosity_level, get_logger  # noqa: F401
from kmdiff_tpu.utils.rss import get_peak_rss, get_current_rss  # noqa: F401
