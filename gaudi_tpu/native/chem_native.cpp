// Native chemistry-validity kernels for the host-side eval tier.
//
// The reference delegates chemical validity to RDKit (a native C++
// dependency) through vendored xyz2mol (reference data/xyz2mol.py:538-679,
// data/gor2goa.py:298-324). This image has no RDKit, so gaudi_tpu ships a
// graph-theoretic equivalent (gaudi_tpu/eval_chem/valence.py); this file is
// its native implementation — connectivity (union-find), valence
// accounting, Kekulé perfect matching (blossom algorithm for general
// graphs), and Weisfeiler-Lehman identity hashing — exposed through a plain
// C ABI for ctypes.
//
// Build: g++ -O3 -shared -fPIC chem_native.cpp -o libgaudichem.so
// (done automatically by gaudi_tpu/native/__init__.py).

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <vector>

namespace {

// ----------------------------------------------------------------------
// Union-find connectivity.

struct DSU {
    std::vector<int> p;
    explicit DSU(int n) : p(n) {
        for (int i = 0; i < n; ++i) p[i] = i;
    }
    int find(int x) {
        while (p[x] != x) x = p[x] = p[p[x]];
        return x;
    }
    void unite(int a, int b) { p[find(a)] = find(b); }
};

// ----------------------------------------------------------------------
// Maximum matching in a general graph (blossom algorithm, O(V^3)).
// Vertices are 0..n-1; adjacency lists in `g`; result in `match`
// (-1 = unmatched). Standard contracted-blossom BFS formulation.

struct Blossom {
    int n;
    const std::vector<std::vector<int>>& g;
    std::vector<int> match, parent, base;
    std::vector<char> used, blossom;
    std::vector<int> q;

    explicit Blossom(const std::vector<std::vector<int>>& adj)
        : n((int)adj.size()), g(adj), match(n, -1), parent(n), base(n),
          used(n), blossom(n) {}

    int lca(int a, int b) {
        std::vector<char> seen(n, 0);
        for (;;) {
            a = base[a];
            seen[a] = 1;
            if (match[a] == -1) break;
            a = parent[match[a]];
        }
        for (;;) {
            b = base[b];
            if (seen[b]) return b;
            b = parent[match[b]];
        }
    }

    void mark_path(int v, int b, int child) {
        while (base[v] != b) {
            blossom[base[v]] = 1;
            blossom[base[match[v]]] = 1;
            parent[v] = child;
            child = match[v];
            v = parent[match[v]];
        }
    }

    int find_path(int root) {
        std::fill(used.begin(), used.end(), 0);
        std::fill(parent.begin(), parent.end(), -1);
        for (int i = 0; i < n; ++i) base[i] = i;
        used[root] = 1;
        q.clear();
        q.push_back(root);
        for (size_t qi = 0; qi < q.size(); ++qi) {
            int v = q[qi];
            for (int to : g[v]) {
                if (base[v] == base[to] || match[v] == to) continue;
                if (to == root || (match[to] != -1 && parent[match[to]] != -1)) {
                    int curbase = lca(v, to);
                    std::fill(blossom.begin(), blossom.end(), 0);
                    mark_path(v, curbase, to);
                    mark_path(to, curbase, v);
                    for (int i = 0; i < n; ++i) {
                        if (blossom[base[i]]) {
                            base[i] = curbase;
                            if (!used[i]) {
                                used[i] = 1;
                                q.push_back(i);
                            }
                        }
                    }
                } else if (parent[to] == -1) {
                    parent[to] = v;
                    if (match[to] == -1) {
                        // augment along the path ending at `to`
                        int u = to;
                        while (u != -1) {
                            int pv = parent[u], ppv = match[pv];
                            match[u] = pv;
                            match[pv] = u;
                            u = ppv;
                        }
                        return 1;
                    }
                    used[match[to]] = 1;
                    q.push_back(match[to]);
                }
            }
        }
        return 0;
    }

    int max_matching() {
        int res = 0;
        for (int v = 0; v < n; ++v)
            if (match[v] == -1 && find_path(v)) ++res;
        return res;
    }
};

// ----------------------------------------------------------------------
// Hash mixing (splitmix64 — stable across runs and platforms).

inline uint64_t splitmix64(uint64_t x) {
    x += 0x9e3779b97f4a7c15ULL;
    x = (x ^ (x >> 30)) * 0xbf58476d1ce4e5b9ULL;
    x = (x ^ (x >> 27)) * 0x94d049bb133111ebULL;
    return x ^ (x >> 31);
}

inline uint64_t mix2(uint64_t a, uint64_t b) {
    return splitmix64(a ^ (b + 0x9e3779b97f4a7c15ULL + (a << 6) + (a >> 2)));
}

}  // namespace

extern "C" {

// Chemical validity of a neutral aromatic atom graph.
//   n            number of heavy atoms
//   min_valence  per-atom allowed valence (e.g. C=4, N=3, B=3)
//   is_carbon    per-atom flag: degree-2 carbons get one implicit H
//                (reference build_molecule_aromatic, gor2goa.py:288-293)
//   m, bonds     bond list, bonds[2k], bonds[2k+1]
// Returns 1 if valid: connected, every residual valence in {0,1}, and the
// residual-1 atoms admit a Kekulé perfect matching within the bond graph.
int gaudi_valence_valid(int n, const int32_t* min_valence,
                        const uint8_t* is_carbon, int m,
                        const int32_t* bonds) {
    if (n <= 0 || m <= 0) return 0;
    std::vector<int> deg(n, 0);
    DSU dsu(n);
    for (int k = 0; k < m; ++k) {
        int a = bonds[2 * k], b = bonds[2 * k + 1];
        if (a < 0 || a >= n || b < 0 || b >= n || a == b) return 0;
        ++deg[a];
        ++deg[b];
        dsu.unite(a, b);
    }
    int root = dsu.find(0);
    for (int i = 1; i < n; ++i)
        if (dsu.find(i) != root) return 0;

    std::vector<int> rem(n), pi_id(n, -1);
    std::vector<int> pi_nodes;
    for (int i = 0; i < n; ++i) {
        int implicit_h = (is_carbon[i] && deg[i] == 2) ? 1 : 0;
        int sigma = deg[i] + implicit_h;
        rem[i] = min_valence[i] - sigma;
        if (rem[i] < 0 || rem[i] > 1) return 0;
        if (rem[i] == 1) {
            pi_id[i] = (int)pi_nodes.size();
            pi_nodes.push_back(i);
        }
    }
    int np = (int)pi_nodes.size();
    if (np == 0) return 1;
    if (np % 2 == 1) return 0;

    std::vector<std::vector<int>> adj(np);
    for (int k = 0; k < m; ++k) {
        int a = pi_id[bonds[2 * k]], b = pi_id[bonds[2 * k + 1]];
        if (a != -1 && b != -1) {
            adj[a].push_back(b);
            adj[b].push_back(a);
        }
    }
    Blossom bl(adj);
    return 2 * bl.max_matching() == np ? 1 : 0;
}

// Weisfeiler-Lehman graph identity hash.
//   labels_in  per-node initial label hashes (element + implicit-H class)
//   iterations WL refinement rounds (the python backend uses 4)
//   out2       128-bit output (two independently mixed 64-bit folds)
// Refinement: label'_v = mix(label_v, sorted multiset of neighbor labels).
// Final: order-independent fold over {labels after every round}.
void gaudi_wl_hash(int n, const uint64_t* labels_in, int m,
                   const int32_t* bonds, int iterations, uint64_t* out2) {
    std::vector<uint64_t> lab(labels_in, labels_in + n), nxt(n);
    std::vector<std::vector<int>> adj(n);
    for (int k = 0; k < m; ++k) {
        int a = bonds[2 * k], b = bonds[2 * k + 1];
        adj[a].push_back(b);
        adj[b].push_back(a);
    }
    uint64_t acc1 = 0x243f6a8885a308d3ULL, acc2 = 0x13198a2e03707344ULL;
    std::vector<uint64_t> nb;
    std::vector<uint64_t> snapshot;
    for (int it = 0; it <= iterations; ++it) {
        // fold current labels order-independently (sorted) into the digest
        snapshot = lab;
        std::sort(snapshot.begin(), snapshot.end());
        for (uint64_t v : snapshot) {
            acc1 = mix2(acc1, v);
            acc2 = mix2(acc2 ^ 0xa5a5a5a5a5a5a5a5ULL, splitmix64(v));
        }
        if (it == iterations) break;
        for (int v = 0; v < n; ++v) {
            nb.clear();
            for (int u : adj[v]) nb.push_back(lab[u]);
            std::sort(nb.begin(), nb.end());
            uint64_t h = splitmix64(lab[v]);
            for (uint64_t x : nb) h = mix2(h, x);
            nxt[v] = h;
        }
        lab.swap(nxt);
    }
    out2[0] = acc1;
    out2[1] = acc2;
}

// Batch judge: validity + identity hash for a packed batch of molecules.
// Offsets: atoms_off[i]..atoms_off[i+1] index into per-atom arrays,
// bonds_off[i]..bonds_off[i+1] into the bond-pair array. `labels` must
// already encode the element + implicit-H class (the python wrapper mixes
// both, identically for single-molecule and batch calls). Outputs one
// validity flag and a 128-bit identity per molecule. Bond indices are
// local to each molecule.
void gaudi_judge_batch(int n_mols, const int64_t* atoms_off,
                       const int64_t* bonds_off, const int32_t* min_valence,
                       const uint8_t* is_carbon, const uint64_t* labels,
                       const int32_t* bonds, int wl_iterations,
                       uint8_t* valid_out, uint64_t* hash_out) {
    for (int i = 0; i < n_mols; ++i) {
        int na = (int)(atoms_off[i + 1] - atoms_off[i]);
        int nb = (int)(bonds_off[i + 1] - bonds_off[i]);
        const int32_t* b = bonds + 2 * bonds_off[i];
        valid_out[i] = (uint8_t)gaudi_valence_valid(
            na, min_valence + atoms_off[i], is_carbon + atoms_off[i], nb, b);
        if (valid_out[i]) {
            gaudi_wl_hash(na, labels + atoms_off[i], nb, b, wl_iterations,
                          hash_out + 2 * i);
        } else {
            hash_out[2 * i] = 0;
            hash_out[2 * i + 1] = 0;
        }
    }
}

}  // extern "C"
