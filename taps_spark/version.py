"""Engine version.

Parity note: the reference gates client/server compatibility on a
version header (lib/taps/server.rb:40-47, lib/taps/version.rb:1-18).
The Spark engine is a single-process library, so the version is
informational only.
"""

__version__ = "0.1.0"
COMPATIBLE_VERSION = "0.1"
