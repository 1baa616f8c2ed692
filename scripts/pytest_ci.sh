#!/bin/bash
# CI gate for the Python on-ramp: compile the JVM side, then run the
# pytest suite (python/test_graft.py) against sf0.001.
set -euo pipefail
cd "$(dirname "$0")/.."
sbt -batch compile > /dev/null
exec python3 -m pytest python/ -q "$@"
