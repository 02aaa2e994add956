#!/bin/bash
# CLIP text tower for text conditioning (optional; hash-fallback otherwise).
mkdir -p deps
echo "Run on a connected machine:"
echo "  huggingface-cli download openai/clip-vit-large-patch14 --local-dir deps/clip-vit-large-patch14"
