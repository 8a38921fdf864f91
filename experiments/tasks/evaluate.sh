#!/bin/bash
# PPL protocol (reference cli/evaluate.py): WikiText-2 test + C4 validation,
# seqlen 2048 non-overlapping windows
MODEL=${1:?model}
python -m paroquant_tpu.cli.evaluate --model "$MODEL" --datasets wikitext2 c4 --seqlen 2048
