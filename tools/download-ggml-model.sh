#!/usr/bin/env bash
# Fetch pre-converted ggml whisper models from Hugging Face
# (mirror of models/download-ggml-model.sh in the reference; the files are
# identical and load unchanged in whisper_tpu).

set -euo pipefail

src="https://huggingface.co/ggerganov/whisper.cpp"
pfx="resolve/main/ggml"

models=(
  tiny tiny.en tiny-q5_1 tiny.en-q5_1 tiny-q8_0
  base base.en base-q5_1 base.en-q5_1 base-q8_0
  small small.en small.en-tdrz small-q5_1 small.en-q5_1 small-q8_0
  medium medium.en medium-q5_0 medium.en-q5_0 medium-q8_0
  large-v1 large-v2 large-v2-q5_0 large-v2-q8_0
  large-v3 large-v3-q5_0
  large-v3-turbo large-v3-turbo-q5_0 large-v3-turbo-q8_0
)

usage() {
  echo "usage: $0 <model> [output-dir]"
  echo "available models:"
  printf '  %s\n' "${models[@]}"
  exit 1
}

[ $# -ge 1 ] || usage
model="$1"
dir="${2:-.}"

ok=0
for m in "${models[@]}"; do [ "$m" = "$model" ] && ok=1; done
[ $ok -eq 1 ] || { echo "invalid model: $model"; usage; }

out="$dir/ggml-$model.bin"
if [ -f "$out" ]; then
  echo "model $model already exists at $out"
  exit 0
fi

url="$src/$pfx-$model.bin"
echo "downloading ggml model $model ..."
if command -v wget >/dev/null; then
  wget --quiet --show-progress -O "$out" "$url"
else
  curl -L --output "$out" "$url"
fi
echo "done: $out"
echo "try: python -m whisper_tpu.cli.transcribe -m $out -f samples/jfk.wav"
