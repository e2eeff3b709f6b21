#!/bin/bash
# Convert raw training datasets to the preprocessed *_rgb.jpg layout
# (reference datasets_preprocess/preprocess_trainingset.sh).
set -e
cd "$(dirname "$0")/.."
python datasets_preprocess/preprocess_pointodyssey.py "$@"
python datasets_preprocess/preprocess_sceneflow.py --subset FlyingThings3D "$@"
python datasets_preprocess/preprocess_sceneflow.py --subset Driving "$@"
python datasets_preprocess/preprocess_sceneflow.py --subset Monkaa "$@"
python datasets_preprocess/preprocess_spring.py "$@"
python datasets_preprocess/preprocess_tartanair.py "$@"
python datasets_preprocess/preprocess_vkitti.py "$@"
