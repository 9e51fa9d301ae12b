# desman_tpu build targets
.PHONY: native test bench clean

native: desman_tpu/_libcountsio.so desman_tpu/_libpileupio.so

desman_tpu/_libcountsio.so: native/countsio.cpp
	g++ -O3 -std=c++17 -shared -fPIC $< -o $@

desman_tpu/_libpileupio.so: native/pileupio.cpp
	g++ -O3 -std=c++17 -shared -fPIC $< -o $@

test:
	PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m pytest tests/ -q

bench:
	python bench.py

clean:
	rm -f desman_tpu/_libcountsio.so desman_tpu/_libpileupio.so
