#!/bin/bash
# Reference recipe (train.sh:3): lr 1e-4, batch 10/device, 180 epochs, RAdam, fold 1
python -m saunet_tpu.cli.train --lr_encoder 1e-4 --batch_size_per_device 10 \
    --num_epoch 180 --optimizer radam --k_split 1 "$@"
