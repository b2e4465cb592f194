"""Formerly the gated-filter registry.  Every reference filter name
now has a real implementation (sdlview was the last: it paints
through the native X11 display client in modules/filters/sdlview.py
instead of SDL, and reports a precise error itself on headless
boxes).  The module is kept so stale imports stay harmless."""

from __future__ import annotations
