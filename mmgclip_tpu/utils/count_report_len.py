"""Report-length statistics tool (reference: mmgclip/utils/count_report_len.py:1-37).

Usage: python -m mmgclip_tpu.utils.count_report_len --file_path image_description.txt
"""

from __future__ import annotations

import argparse

import numpy as np

from .table import Table


def report_length_stats(lines):
    word_counts = []
    sentence_counts = []
    for line in lines:
        line = line.rstrip()
        if len(line) >= 2 and line[0] == line[-1] == '"':
            line = line[1:-1]  # strip wrapping quotes from the csv export
        word_counts.append(len(line.split()))
        sentence_counts.append(line.count("."))
    return word_counts, sentence_counts


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--file_path", type=str, required=True, help="Path to the text file.")
    args = parser.parse_args()
    if not args.file_path.endswith(".txt"):
        raise ValueError("File path should be a path of a text `.txt` file.")

    with open(args.file_path) as fh:
        word_counts, sentence_counts = report_length_stats(fh)

    general = Table(["General"])
    general.add_row([f"Total number of reports is {len(word_counts)}"])
    general.add_row([f"Total number of unique report lengths is {len(np.unique(word_counts))}"])
    general.add_row(
        [
            f"Average count of words in all reports is {round(np.mean(word_counts), 3)}, "
            f"STD is {round(np.std(word_counts), 3)}"
        ]
    )

    results = Table(["Description", "Value", "Index"])
    results.add_row(["Minimum count of words in one report", min(word_counts), word_counts.index(min(word_counts)) + 1])
    results.add_row(["Maximum count of words in one report", max(word_counts), word_counts.index(max(word_counts)) + 1])
    results.add_row(["Minimum count of sentences in one report", min(sentence_counts), sentence_counts.index(min(sentence_counts)) + 1])
    results.add_row(["Maximum count of sentences in one report", max(sentence_counts), sentence_counts.index(max(sentence_counts)) + 1])

    print(general)
    print(results)


if __name__ == "__main__":
    main()
