

class TestImplicitStdinGate:
    def test_dev_null_stdin_is_not_spooled(self, monkeypatch):
        """ADVICE r3: a forgotten -i under cron (stdin=/dev/null)
        must be a usage error, not a silent empty-input run."""
        import sys
        from tcforge_tpu.tools._cli import _stdin_is_data
        with open("/dev/null", "rb") as f:
            monkeypatch.setattr(sys, "stdin", f)
            assert not _stdin_is_data()

    def test_regular_file_stdin_is_spooled(self, monkeypatch, tmp_path):
        import sys
        p = tmp_path / "x.bin"
        p.write_bytes(b"abc")
        with open(p, "rb") as f:
            monkeypatch.setattr(sys, "stdin", f)
            from tcforge_tpu.tools._cli import _stdin_is_data
            assert _stdin_is_data()
