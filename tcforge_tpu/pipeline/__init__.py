"""tcforge_tpu.pipeline — the engine.

Rebuild of the reference's threaded core (``src/``): the pthread frame
ring + 3 thread stages (import -> filter workers -> export,
``src/framebuffer.c`` / ``frame_threads.c`` / ``libtcexport/export.c``)
become a host feeder streaming batched frame tensors through ONE jitted
filter-chain function, with reader/writer threads providing the overlap
the ring buffer used to provide.
"""
