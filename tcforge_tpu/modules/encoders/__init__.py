"""Built-in encoder modules (encode/encode_*.c analogues)."""

from tcforge_tpu.modules.encoders import basic  # noqa: F401
from tcforge_tpu.modules.encoders import image_enc  # noqa: F401
from tcforge_tpu.modules.encoders import mpeg2  # noqa: F401
from tcforge_tpu.modules.encoders import vorbis_enc  # noqa: F401
from tcforge_tpu.modules.encoders import av_audio_enc  # noqa: F401
from tcforge_tpu.modules.encoders import lavc_enc  # noqa: F401
from tcforge_tpu.modules.encoders import lzo_enc  # noqa: F401
from tcforge_tpu.modules.encoders import bridge_video  # noqa: F401
from tcforge_tpu.modules.encoders import gated  # noqa: F401
