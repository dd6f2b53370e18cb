#!/bin/sh
# The five benchmark configurations from BASELINE.json, end to end.
# Requires datasets under $DATA_ROOT and converted checkpoints under
# $MCM_TPU_CKPT_DIR (see tools/convert_checkpoint.py).
set -e

DATA_ROOT=${DATA_ROOT:-datasets}
NAME=${1:-bench_suite}

# 1. CLIP-B/16 zero-shot MCM: Pet-37 (ID) vs Texture (OOD)
python eval_ood_detection.py --in_dataset pet37 --root-dir "$DATA_ROOT" \
    --CLIP_ckpt ViT-B/16 --score MCM --name "${NAME}_pet37" \
    --out_datasets dtd

# 2. Hard-OOD pair: ImageNet-10 vs ImageNet-20 and the reverse
python eval_ood_detection.py --in_dataset ImageNet10 --root-dir "$DATA_ROOT" \
    --CLIP_ckpt ViT-B/16 --score MCM --name "${NAME}_in10"
python eval_ood_detection.py --in_dataset ImageNet20 --root-dir "$DATA_ROOT" \
    --CLIP_ckpt ViT-B/16 --score MCM --name "${NAME}_in20"

# 3. Fine-grained ID suite vs the 4 OOD sets
for ID in bird200 car196 food101; do
    python eval_ood_detection.py --in_dataset "$ID" --root-dir "$DATA_ROOT" \
        --CLIP_ckpt ViT-B/16 --score MCM --name "${NAME}_${ID}"
done

# 4. Full benchmark: ImageNet-1k vs iNaturalist/SUN/Places/Texture
python eval_ood_detection.py --in_dataset ImageNet --root-dir "$DATA_ROOT" \
    --CLIP_ckpt ViT-B/16 --score MCM --name "${NAME}_in1k" --eval_accuracy

# 5. ViT-L/14 full benchmark + supervised ViT-B MSP baseline
python eval_ood_detection.py --in_dataset ImageNet --root-dir "$DATA_ROOT" \
    --CLIP_ckpt ViT-L/14 --score MCM --name "${NAME}_l14"
python eval_msp_baseline.py --in_dataset ImageNet --root-dir "$DATA_ROOT" \
    --name "${NAME}_msp"

# device throughput headline
python bench.py
