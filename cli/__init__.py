"""Entry-point parity CLIs (reference train.py / multi_modal.py /
uni_modal.py / validate.py / dataset_populate.py) plus the serving CLI.

Each module is runnable both as a script (``python cli/train.py``) and
through the installed console scripts declared in pyproject.toml
(``mimm-train``, ``mimm-multi-modal``, ...).
"""
