# Developer targets (the reference exposes cmake test/lint targets;
# CMakeLists.txt:120-140).

PY ?= python

.PHONY: test test-fast bench native lint clean

test:
	$(PY) -m pytest tests/ -q

test-fast:
	$(PY) -m pytest tests/ -q -m "not slow"

bench:
	$(PY) bench.py

native:
	$(PY) -c "from demucs_tpu.native import build_and_load; build_and_load('ggml_loader'); print('native ok')"

lint:
	$(PY) -m compileall -q demucs_tpu tests bench.py __graft_entry__.py

clean:
	rm -rf demucs_tpu/native/build .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
