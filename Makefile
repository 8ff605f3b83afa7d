# typeagent-tpu developer targets (parity role: reference Makefile)

.PHONY: test coverage eval bench native clean format help profile check-similarity typecheck

help:
	@echo "targets: test coverage eval bench native clean"

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q --ignore=tests/test_mcp.py

coverage:
	python -m pytest tests/ -q --cov=typeagent_tpu --cov-report=term-missing || \
		python -m pytest tests/ -q  # pytest-cov not installed

# Golden-answer evaluation over the bundled fixture conversation (no LLM,
# no network; compares search results against tests/testdata goldens).
eval:
	python -m typeagent_tpu.tools.eval_golden

# Replay the reference's 67-query Episode-53 corpus (real compiled trees)
# through both query engines and diff against committed goldens (parity
# role: reference `make eval` batch compare). Needs /root/reference.
eval-episode53:
	python -m typeagent_tpu.tools.eval_episode53

bench:
	python bench.py

# Stage-3 engine benchmark: fused device executor vs the host query VM at
# a chosen knowledge scale (hermetic data; runs on whatever backend is up).
bench-engine:
	python -m typeagent_tpu.tools.benchmark_engine

# cProfile the no-LLM search path over the golden fixture (parity role:
# reference `make profile`). Writes prof.out; inspect with pstats/snakeviz.
profile:
	python -m cProfile -o prof.out -m typeagent_tpu.tools.eval_golden
	python -c "import pstats; pstats.Stats('prof.out').sort_stats('cumtime').print_stats(25)"

native:
	$(MAKE) -C native

# Static annotation gate (parity role: the reference's pyright-strict CI).
typecheck:
	python tools/check_types.py

# Guard against drifting back toward reference-identical file structure.
check-similarity:
	python tools/check_similarity.py

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
