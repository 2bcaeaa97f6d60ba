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
#include <cmath>
#include <utility>
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

// ----------------------------------------------------------------------
// GOR -> GOA: expand a graph-of-rings to a graph-of-atoms.
// Native implementation of gaudi_tpu/eval_chem/gor2goa.py (itself a rebuild
// of reference data/gor2goa.py:133-261): ring adjacency from type-pair
// distance windows, inertia-plane alignment, template-polygon expansion
// rotated per orientation handle, fusion-bond contraction by closest-pair
// matching under a union-find.

extern "C" {

// Inputs: one molecule with n_total ring rows — raw 3-D coords `x` (used
// for the distance-window adjacency) plus the inertia-aligned 2-D frame
// `xy` (computed by the python wrapper with numpy.linalg.eigh so the frame
// — including its reflection — is bit-identical to the python path;
// template placement is chirality-sensitive, so the frame must match).
// orientation_mode=1 means the second half are orientation pseudo-nodes.
// Vocabulary arrays (K ring types) come from the python wrapper so the
// tables live in one place. Outputs 2-D atom positions (alignment frame),
// atom-type indices, and a deduplicated bond list. Returns 0 on success,
// -1 bad ring type / no template, -2 capacity exceeded.
int gaudi_gor2goa(
    int n_total, const double* x, const double* xy_in, const int32_t* types,
    int orientation_mode,
    int K, const double* win_lo, const double* win_hi,
    const int32_t* tmpl_size, const double* tmpl_xy, const int32_t* slot_elem,
    const uint8_t* no_orient, const double* orient_offset,
    const int32_t* h_slot, int32_t h_elem_idx, double tol,
    double* out_pos, int32_t* out_elem, int32_t* out_bonds,
    int cap, int capb, int32_t* out_n) {
    int n = orientation_mode ? n_total / 2 : n_total;
    if (n <= 0) return -1;
    for (int i = 0; i < n; ++i)
        if (types[i] < 0 || types[i] >= K || tmpl_size[types[i]] <= 0)
            return -1;

    // ring adjacency from 3-D distance windows (positions2adj semantics)
    std::vector<char> adj(n * n, 0);
    for (int i = 0; i < n; ++i) {
        for (int j = i + 1; j < n; ++j) {
            double d = 0;
            for (int c = 0; c < 3; ++c) {
                double dd = x[3 * i + c] - x[3 * j + c];
                d += dd * dd;
            }
            d = std::sqrt(d);
            double lo = win_lo[types[i] * K + types[j]];
            double hi = win_hi[types[i] * K + types[j]];
            if (d > lo * (1.0 - tol) && d < hi * (1.0 + tol))
                adj[i * n + j] = adj[j * n + i] = 1;
        }
    }

    const double* xy = xy_in;

    // template expansion
    int n_atoms = 0, n_bonds = 0;
    std::vector<int> ring_start(n), ring_size(n);
    auto add_bond = [&](int a, int b) -> bool {
        if (n_bonds >= capb) return false;
        out_bonds[2 * n_bonds] = a;
        out_bonds[2 * n_bonds + 1] = b;
        ++n_bonds;
        return true;
    };
    for (int i = 0; i < n; ++i) {
        int ti = types[i];
        int k = tmpl_size[ti];
        double angle;
        double cx = xy[2 * i], cy = xy[2 * i + 1];
        if (no_orient[ti]) {
            angle = 0.0;
            for (int j = 0; j < n; ++j) {
                if (adj[i * n + j]) {
                    angle = std::atan2(xy[2 * j + 1] - cy, xy[2 * j] - cx);
                    break;
                }
            }
            angle += orient_offset[ti];
        } else {
            double ox = xy[2 * (n + i)], oy = xy[2 * (n + i) + 1];
            angle = std::atan2(oy - cy, ox - cx);
        }
        double ca = std::cos(angle), sa = std::sin(angle);
        ring_start[i] = n_atoms;
        ring_size[i] = k;
        if (n_atoms + k + 2 > cap) return -2;
        for (int s = 0; s < k; ++s) {
            double px = tmpl_xy[(ti * 6 + s) * 2];
            double py = tmpl_xy[(ti * 6 + s) * 2 + 1];
            out_pos[2 * (n_atoms + s)] = px * ca - py * sa + cx;
            out_pos[2 * (n_atoms + s) + 1] = px * sa + py * ca + cy;
            out_elem[n_atoms + s] = slot_elem[ti * 6 + s];
            if (!add_bond(n_atoms + s, n_atoms + (s + 1) % k)) return -2;
        }
        n_atoms += k;
        for (int hs = 0; hs < 2; ++hs) {
            int slot = h_slot[ti * 2 + hs];
            if (slot < 0) continue;
            if (n_atoms >= cap) return -2;
            int base = ring_start[i] + slot;
            out_pos[2 * n_atoms] =
                out_pos[2 * base] + (out_pos[2 * base] - cx) * 0.4;
            out_pos[2 * n_atoms + 1] =
                out_pos[2 * base + 1] + (out_pos[2 * base + 1] - cy) * 0.4;
            out_elem[n_atoms] = h_elem_idx;
            if (!add_bond(base, n_atoms)) return -2;
            ++n_atoms;
        }
    }

    // fusion contraction: per adjacent ring pair, union the two closest
    // inter-ring atom pairs (ring slots only, not explicit H)
    DSU dsu(n_atoms);
    struct PD {
        double d;
        int pi, pj;
    };
    std::vector<PD> pd;
    for (int i = 0; i < n; ++i) {
        for (int j = i + 1; j < n; ++j) {
            if (!adj[i * n + j]) continue;
            pd.clear();
            for (int a = 0; a < ring_size[i]; ++a) {
                for (int b = 0; b < ring_size[j]; ++b) {
                    int ia = ring_start[i] + a, ib = ring_start[j] + b;
                    double dx = out_pos[2 * ia] - out_pos[2 * ib];
                    double dy = out_pos[2 * ia + 1] - out_pos[2 * ib + 1];
                    pd.push_back({dx * dx + dy * dy, ia, ib});
                }
            }
            std::sort(pd.begin(), pd.end(), [](const PD& u, const PD& v) {
                if (u.d != v.d) return u.d < v.d;
                if (u.pi != v.pi) return u.pi < v.pi;
                return u.pj < v.pj;
            });
            int picked = 0;
            std::vector<char> used_i(n_atoms, 0), used_j(n_atoms, 0);
            for (const PD& e : pd) {
                if (used_i[e.pi] || used_j[e.pj]) continue;
                dsu.unite(e.pi, e.pj);
                used_i[e.pi] = used_j[e.pj] = 1;
                if (++picked == 2) break;
            }
        }
    }

    // collapse classes (first-occurrence order), average positions
    std::vector<int> new_idx(n_atoms, -1), root_of(n_atoms);
    std::vector<double> acc_x, acc_y;
    std::vector<int> cnt;
    std::vector<int32_t> elem_out;
    int m = 0;
    for (int a = 0; a < n_atoms; ++a) {
        int r = dsu.find(a);
        root_of[a] = r;
        if (new_idx[r] == -1) {
            new_idx[r] = m++;
            acc_x.push_back(0);
            acc_y.push_back(0);
            cnt.push_back(0);
            elem_out.push_back(out_elem[a]);
        }
        int ni = new_idx[r];
        acc_x[ni] += out_pos[2 * a];
        acc_y[ni] += out_pos[2 * a + 1];
        cnt[ni] += 1;
    }
    std::vector<std::pair<int32_t, int32_t>> bonds;
    bonds.reserve(n_bonds);
    for (int e = 0; e < n_bonds; ++e) {
        int a = new_idx[root_of[out_bonds[2 * e]]];
        int b = new_idx[root_of[out_bonds[2 * e + 1]]];
        if (a == b) continue;
        bonds.emplace_back(std::min(a, b), std::max(a, b));
    }
    std::sort(bonds.begin(), bonds.end());
    bonds.erase(std::unique(bonds.begin(), bonds.end()), bonds.end());

    for (int i = 0; i < m; ++i) {
        out_pos[2 * i] = acc_x[i] / cnt[i];
        out_pos[2 * i + 1] = acc_y[i] / cnt[i];
        out_elem[i] = elem_out[i];
    }
    for (size_t e = 0; e < bonds.size(); ++e) {
        out_bonds[2 * e] = bonds[e].first;
        out_bonds[2 * e + 1] = bonds[e].second;
    }
    out_n[0] = m;
    out_n[1] = (int32_t)bonds.size();
    return 0;
}

}  // extern "C"
