"""Analysis notebooks (runnable percent-format scripts + generated .ipynb)."""
