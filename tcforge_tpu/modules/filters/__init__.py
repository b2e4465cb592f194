"""Built-in filter modules (filter/filter_*.c analogues).

Each submodule registers one or more VideoFilter/AudioFilter classes;
hot spatio-temporal filters keep their temporal state as explicit jax
carries so the whole chain stays jit-compatible.
"""

from tcforge_tpu.modules.filters import simple  # noqa: F401
from tcforge_tpu.modules.filters import hqdn3d  # noqa: F401
from tcforge_tpu.modules.filters import unsharp  # noqa: F401
from tcforge_tpu.modules.filters import denoise3d  # noqa: F401
from tcforge_tpu.modules.filters import cadence  # noqa: F401
from tcforge_tpu.modules.filters import msharpen  # noqa: F401
from tcforge_tpu.modules.filters import smooth  # noqa: F401
from tcforge_tpu.modules.filters import xsharpen  # noqa: F401
from tcforge_tpu.modules.filters import smartdeinter  # noqa: F401
from tcforge_tpu.modules.filters import bob  # noqa: F401
from tcforge_tpu.modules.filters import rate  # noqa: F401
from tcforge_tpu.modules.filters import audio_filters  # noqa: F401
from tcforge_tpu.modules.filters import tomsmocomp  # noqa: F401
from tcforge_tpu.modules.filters import dnr  # noqa: F401
from tcforge_tpu.modules.filters import overlay  # noqa: F401
from tcforge_tpu.modules.filters import modfps  # noqa: F401
from tcforge_tpu.modules.filters import yuvdenoise  # noqa: F401
from tcforge_tpu.modules.filters import median  # noqa: F401
from tcforge_tpu.modules.filters import extras  # noqa: F401
from tcforge_tpu.modules.filters import stabilize  # noqa: F401
from tcforge_tpu.modules.filters import yait  # noqa: F401
from tcforge_tpu.modules.filters import text  # noqa: F401
from tcforge_tpu.modules.filters import subtitler  # noqa: F401
from tcforge_tpu.modules.filters import extsub  # noqa: F401
from tcforge_tpu.modules.filters import preview  # noqa: F401
from tcforge_tpu.modules.filters import analysis  # noqa: F401
from tcforge_tpu.modules.filters import controlf  # noqa: F401
from tcforge_tpu.modules.filters import asciiart  # noqa: F401
from tcforge_tpu.modules.filters import pp  # noqa: F401
from tcforge_tpu.modules.filters import gated  # noqa: F401
from tcforge_tpu.modules.filters import sdlview  # noqa: F401
