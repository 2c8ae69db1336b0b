#!/bin/sh
# Fetch the reference's public checkpoints + demo data and convert the
# checkpoints to the .npz trees this framework loads.
# (Reference: download.sh — same HuggingFace artifacts; requires network.)
set -e

mkdir -p models datasets results

wget -O models/scannet.pth \
  "https://huggingface.co/datasets/makezur/SuperPrimitive-Data/resolve/main/scannet.pth?download=true"
wget -O models/sam_vit_h_4b8939.pth \
  "https://huggingface.co/datasets/makezur/SuperPrimitive-Data/resolve/main/sam_vit_h_4b8939.pth?download=true"

wget -O datasets/replica.zip \
  "https://huggingface.co/datasets/makezur/SuperPrimitive-Data/resolve/main/replica_scene.zip?download=true"
unzip -o datasets/replica.zip -d datasets/replica
rm datasets/replica.zip

wget -O datasets/TUM_fr1.zip \
  "https://huggingface.co/datasets/makezur/SuperPrimitive-Data/resolve/main/TUM_associated.zip?download=true"
unzip -o datasets/TUM_fr1.zip -d datasets/TUM_fr1
rm datasets/TUM_fr1.zip

# torch -> flax conversion (+ layer-by-layer validation when the reference's
# torch packages are importable)
python convert_checkpoints.py \
  --sam models/sam_vit_h_4b8939.pth --out-sam models/sam_vit_h.npz \
  --nnet models/scannet.pth --out-nnet models/nnet_scannet.npz \
  --validate || python convert_checkpoints.py \
  --sam models/sam_vit_h_4b8939.pth --out-sam models/sam_vit_h.npz \
  --nnet models/scannet.pth --out-nnet models/nnet_scannet.npz

echo "done: models/sam_vit_h.npz models/nnet_scannet.npz + datasets/"
