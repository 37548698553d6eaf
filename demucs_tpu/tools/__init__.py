"""Offline tooling: weight conversion and evaluation.

Mirrors the reference's scripts/ directory (SURVEY.md §2.5):
convert-pth-to-ggml.py -> convert_pth_to_ggml, evaluate-demixed-output.py
-> evaluate_sdr (museval-free numpy implementation).
"""
