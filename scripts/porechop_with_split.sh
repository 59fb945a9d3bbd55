#!/bin/bash
# Split the input into N parts, adapter-trim each with porechop, re-concatenate.
# Equivalent of the reference's scripts/porechop_with_split.sh (which uses
# seqkit split2); the splitting here is scripts/split_fastq.py.
#
# Usage: porechop_with_split.sh <input.fastq[.gz]> <output_prefix> <parts> <threads>
set -e

script_dir=$(dirname "$0")
porechop=${PORECHOP:-porechop}

input=$1
output_prefix=$2
parts=$3
threads=$4

tmp_dir="${output_prefix}.split"
mkdir -p "$tmp_dir"
python "${script_dir}/split_fastq.py" "$input" "$tmp_dir" --parts "$parts"

out="${output_prefix}.fastq.gz"
: > "$out"
for part in "$tmp_dir"/part_*.fastq.gz; do
    trimmed="${part%.fastq.gz}.trimmed.fastq.gz"
    $porechop -i "$part" -o "$trimmed" --threads "$threads" --adapter_threshold 95
    cat "$trimmed" >> "$out"
    rm "$part" "$trimmed"
done
rmdir "$tmp_dir"
