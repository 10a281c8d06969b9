#!/usr/bin/env bash
# Clean up stray training processes (reference kill_python_processes.sh):
# kills leftover framework CLI / bench runs, never other python processes.
set -u
pkill -f "multimodal_brain_pattern_identification_xai_tpu (train|bench)" 2>/dev/null
pkill -f "python bench.py" 2>/dev/null
echo "stale runs cleaned"
