"""`aligner` CLI shim: preserves the reference's entry-point name
(`python -m aligner command=... encoder=... data=...`) on top of fitclip_tpu."""

from fitclip_tpu.cli.main import main  # noqa: F401
