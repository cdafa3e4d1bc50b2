from hyrise_tpu.expression.ast import *  # noqa: F401,F403
