#!/bin/bash
# Prepare test sequences (reference datasets_preprocess/preprocess_testset.sh).
set -e
cd "$(dirname "$0")/.."
python datasets_preprocess/preprocess_bonn.py "$@"
python datasets_preprocess/prepare_tum.py "$@"
