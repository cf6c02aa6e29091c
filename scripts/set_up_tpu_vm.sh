#!/usr/bin/env bash
# Bootstrap a Cloud TPU VM for fitclip_tpu — the TPU-native analogue of the
# reference's GPU VM bootstrap (scripts/set_up_gcp.sh: apt deps, accelerator
# daemon, env manager, shell aliases, scratch storage). TPU VMs need no
# persistence daemon and ship the runtime in libtpu; what remains is system
# deps for the native decoder, the Python env, aliases, and fast scratch.
#
# Provisioning (run from a workstation; adjust type/zone):
#   gcloud compute tpus tpu-vm create fitclip-v5e \
#     --zone=us-west4-a --accelerator-type=v5litepod-8 \
#     --version=v2-alpha-tpuv5-lite
#   gcloud compute tpus tpu-vm ssh fitclip-v5e --zone=us-west4-a \
#     -- 'bash -s' < scripts/set_up_tpu_vm.sh

set -ex

# --- system deps: FFmpeg dev libs for the native decoder extension, build
# --- toolchain, OpenCV runtime deps for the fallback reader.
sudo apt update
sudo apt install -y --no-install-recommends \
  build-essential \
  ffmpeg \
  libavcodec-dev \
  libavformat-dev \
  libavutil-dev \
  libswscale-dev \
  libgl1 \
  unattended-upgrades

sudo systemctl enable unattended-upgrades.service
sudo systemctl start unattended-upgrades.service

# --- Python env: TPU jax wheels + the framework (editable) + its extension.
python3 -m venv ~/venv
# shellcheck disable=SC1090
source ~/venv/bin/activate
pip install -U pip
pip install -U "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
pip install -e .
make -C native

# --- shell aliases (same command surface as the reference's).
cat <<'EOF' >> ~/.bashrc
source ~/venv/bin/activate
alias aligner='python -m aligner'

alias evaluate='python -m aligner command=evaluate'
alias train='python -m aligner command=train'
EOF

# --- scratch: stripe the local NVMe SSDs (if the VM was created with
# --- --data-disk) for decode-heavy datasets and the eval frame cache.
SCRATCH_DIR="/scratch"
sudo mkdir -p "$SCRATCH_DIR"
if compgen -G "/dev/nvme0n[1-9]" > /dev/null; then
  DEVICES=(/dev/nvme0n[1-9])
  if [ "${#DEVICES[@]}" -gt 1 ]; then
    sudo mdadm --create /dev/md0 --level=0 \
      --raid-devices="${#DEVICES[@]}" "${DEVICES[@]}"
    SCRATCH_DEV=/dev/md0
  else
    SCRATCH_DEV="${DEVICES[0]}"
  fi
  sudo mkfs.ext4 -F "$SCRATCH_DEV"
  sudo mount "$SCRATCH_DEV" "$SCRATCH_DIR"
fi
sudo chmod a+w "$SCRATCH_DIR"
mkdir -p "$SCRATCH_DIR/frame_cache" "$SCRATCH_DIR/checkpoints"

# Multi-host pods: every worker runs this same script
# (gcloud ... ssh --worker=all), then training enters through
# fitclip_tpu.parallel.multihost.maybe_initialize_distributed() — see
# ARCHITECTURE.md.
