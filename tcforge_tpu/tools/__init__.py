"""tcforge_tpu.tools — standalone CLI tools.

Analogues of the reference's tool binaries (``import/tc*`` and
``tools/avi*``): tcprobe, tccat, tcexport, tcmodinfo, tcmodchain,
avimerge, avisplit, avifix, aviindex.  Run as
``python -m tcforge_tpu.tools.<name>``.
"""
