from .generate import generate_raw_rows, write_chainweb_fixture, fixture_dir

__all__ = ["generate_raw_rows", "write_chainweb_fixture", "fixture_dir"]
