"""Built-in multiplexor modules (multiplex/multiplex_*.c analogues)."""

from tcforge_tpu.modules.muxers import basic  # noqa: F401
from tcforge_tpu.modules.muxers import im_mux  # noqa: F401
from tcforge_tpu.modules.muxers import ogg_mux  # noqa: F401
from tcforge_tpu.modules.muxers import ps_mux  # noqa: F401
