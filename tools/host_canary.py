import multiprocessing as mp, time, numpy as np
def w(q):
    a = np.ones(64_000_000 // 8, dtype=np.float64)  # 64 MB
    t0 = time.time(); n = 0
    while time.time() - t0 < 6:
        a.sum(); n += 1
    q.put(n * a.nbytes / (time.time() - t0))
if __name__ == "__main__":
    q = mp.Queue()
    ps = [mp.Process(target=w, args=(q,)) for _ in range(8)]
    [p.start() for p in ps]; [p.join() for p in ps]
    print(round(sum(q.get() for _ in ps) / 1e9, 2))
