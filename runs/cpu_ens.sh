#!/bin/bash
# CPU-side D4-ensemble + int8 quality evals: protocol numerics are
# HIGHEST-precision and deterministic, so these PSNR/SSIM rows equal the
# on-chip values — produced here to de-risk the wedged relay.
set -u
cd /root/repo
E="env JAX_PLATFORMS=cpu PYTHONPATH=/root/repo"

ev () {  # ev <workdir> <tag> [extra...]
  local wd=$1 tag=$2; shift 2
  $E timeout 5400 python -m ml_super_resolution_tpu.cli eval \
    --workdir "$wd" --best "$@" \
    > "runs/${tag}.json" 2> "runs/${tag}.err"
  echo "== $tag: $(tail -c 300 runs/${tag}.json)"
}

echo "=== CPU ensemble evals ($(date -u +%H:%M)) ==="
ev runs/r3_srcnn_x2    cpu_ens_srcnn    --ensemble
ev runs/r3_espcn_x4    cpu_ens_espcn_x4 --ensemble
ev runs/r3_vdsr_ms     cpu_ens_vdsr     --ensemble --scales 2,3,4
ev runs/r3_edsr_x4     cpu_ens_edsr     --ensemble
ev runs/r3_srresnet_x4 cpu_ens_srresnet --ensemble
ev runs/r3_srgan_x4    cpu_ens_srgan    --ensemble

echo "=== CPU int8 evals ($(date -u +%H:%M)) ==="
ev runs/r3_srcnn_x2    cpu_int8_srcnn    --int8
ev runs/r3_espcn_x4    cpu_int8_espcn_x4 --int8
ev runs/r3_vdsr_ms     cpu_int8_vdsr     --int8 --scales 2,3,4
ev runs/r3_edsr_x4     cpu_int8_edsr     --int8
ev runs/r3_srresnet_x4 cpu_int8_srresnet --int8
ev runs/r3_srgan_x4    cpu_int8_srgan    --int8

echo "=== CPU plain evals (int8-delta references) ($(date -u +%H:%M)) ==="
ev runs/r3_srcnn_x2    cpu_f32_srcnn
ev runs/r3_espcn_x4    cpu_f32_espcn_x4
ev runs/r3_vdsr_ms     cpu_f32_vdsr --scales 2,3,4
ev runs/r3_edsr_x4     cpu_f32_edsr
ev runs/r3_srresnet_x4 cpu_f32_srresnet
ev runs/r3_srgan_x4    cpu_f32_srgan

echo "CPU_ENS DONE ($(date -u +%H:%M))"
