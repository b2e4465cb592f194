"""Built-in import (demultiplexor) modules.

Analogues of the reference's ``import/import_*.c`` family, re-expressed
as host-side batch readers feeding planar numpy arrays.
"""

from tcforge_tpu.modules.importers import (avi_import, framegen, raw_import,
                                           wav_import, y4m_import,
                                           mpeg_import,
                                           im_import,
                                           xml_import,
                                           nuv_import,
                                           pvn_import,
                                           mov_import,
                                           ogg_import,
                                           device_import,
                                           vag_import,
                                           ffmpeg_import,
                                           audio_import,
                                           au_import,
                                           multi)  # noqa: F401
