#!/bin/bash
# Preprocess raw simplex nanopore reads without input splitting.
#
# Same pipeline as the reference's scripts/no_split.sh: porechop adapter
# trimming -> duplex_tools split_on_adapter -> length filter (>= 10 kb),
# running porechop on the whole input in one pass (use preprocess.sh with
# split_parts > 1 when RAM is a concern). The final length filter uses
# scripts/length_filter.py so seqkit is not required.
#
# Usage: no_split.sh <input.fastq[.gz]> <output_prefix> <threads>
set -e

script_dir=$(dirname "$0")
porechop=${PORECHOP:-porechop}
duplex_tools=${DUPLEX_TOOLS:-duplex_tools}
min_len=${MIN_LEN:-10000}
format=fastq.gz

if [ "$#" -ne 3 ]; then
    echo "Usage: $0 <input.fastq[.gz]> <output_prefix> <threads>"
    exit 1
fi

input=$1
output_prefix=$2
num_threads=$3

output_dir=$(dirname "$output_prefix")
mkdir -p "$output_dir"

echo "Start: $(date)"
SECONDS=0

# 1. adapter trimming, single pass
porechop_output="${output_dir}/porechopped.${format}"
$porechop -i "$input" -o "$porechop_output" --threads "$num_threads" --adapter_threshold 95

# 2. split chimeric reads on internal adapters
dt_in="${output_dir}/duplex_tools_input_dir"
dt_out="${output_dir}/duplex_tools_output_dir"
mkdir -p "$dt_in"
mv "$porechop_output" "$dt_in"
$duplex_tools split_on_adapter --threads "$num_threads" --allow_multiple_splits "$dt_in" "$dt_out" Native

# 3. length filter (no seqkit needed)
filtered="${output_prefix}.${format}"
python "${script_dir}/length_filter.py" --min-len "$min_len" "$dt_out"/*.fastq.gz -o "$filtered"

rm -r "$dt_in" "$dt_out"

echo "End: $(date); took ${SECONDS}s"
