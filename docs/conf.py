# Sphinx configuration (mirrors the reference's readthedocs setup —
# SURVEY.md §2a docs row). Build: sphinx-build -b html docs docs/_build
import os
import sys

sys.path.insert(0, os.path.abspath(".."))

project = "atomsmm_tpu"
author = "atomsmm_tpu developers"
extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.doctest",
    "sphinx.ext.viewcode",
]
html_theme = "sphinx_rtd_theme"
autodoc_member_order = "bysource"
