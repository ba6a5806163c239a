.PHONY: native test bench clean

native:
	g++ -O3 -shared -fPIC -std=c++17 -pthread native/hostops.cpp -o native/libhostops.so

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

clean:
	rm -f native/libhostops.so
