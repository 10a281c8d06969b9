"""Native host runtime — C++ batch assembly behind a ctypes facade.

Builds ``libhostloader.so`` from :file:`hostloader.cpp` on first use (g++,
cached next to the source); degrades gracefully to a numpy fallback when
no compiler is available, so the framework never hard-depends on the
native path.
"""

from .loader import (native_available, gather_windows,  # noqa: F401
                     gather_windows_into, gather_multimodal,
                     NativeBatchQueue)
