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
#include <array>
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

// ----------------------------------------------------------------------
// AC2BO: bond-order inference over valence assignments — the native
// implementation of gaudi_tpu/eval_chem/xyz2mol_bo.py (itself the
// reference's xyz2mol.AC2BO semantics, data/xyz2mol.py:538-633). Candidate
// valence lists keep the reference's ORDER (first status-OK combo wins).

static int valence_candidates(int z, int* out /*>=3*/) {
    switch (z) {
        case 1: case 9: case 17: case 35: case 53: out[0] = 1; return 1;
        case 5: out[0] = 3; out[1] = 4; return 2;
        case 6: case 14: out[0] = 4; return 1;
        case 7: out[0] = 3; out[1] = 4; return 2;
        case 8: out[0] = 2; out[1] = 1; out[2] = 3; return 3;
        case 15: out[0] = 5; out[1] = 3; return 2;
        case 16: out[0] = 6; out[1] = 3; out[2] = 2; return 3;
        default: return 0;
    }
}

static int valence_electrons_of(int z) {
    switch (z) {
        case 1: return 1;  case 5: return 3;  case 6: return 4;
        case 7: return 5;  case 8: return 6;  case 9: return 7;
        case 14: return 4; case 15: return 5; case 16: return 6;
        case 17: return 7; case 35: return 7; case 53: return 7;
        default: return 0;
    }
}

static int atomic_charge_of(int z, int bo_val) {
    if (z == 1) return 1 - bo_val;
    if (z == 5) return 3 - bo_val;
    if (z == 15 && bo_val == 5) return 0;
    if (z == 16 && bo_val == 6) return 0;
    return valence_electrons_of(z) - 8 + bo_val;
}

static const long kMaxCombos = 65536;  // reference product is unbounded

// Maximum matching among unsaturated atoms over AC edges -> (i, j) pairs.
static void ua_match_pairs(int n, const std::vector<uint8_t>& ac,
                           const std::vector<int>& ua,
                           std::vector<std::pair<int, int>>& pairs) {
    pairs.clear();
    int np = (int)ua.size();
    if (np < 2) return;
    std::vector<int> id(n, -1);
    for (int k = 0; k < np; ++k) id[ua[k]] = k;
    std::vector<std::vector<int>> adj(np);
    bool any = false;
    for (int k = 0; k < np; ++k)
        for (int l = k + 1; l < np; ++l)
            if (ac[ua[k] * n + ua[l]]) {
                adj[k].push_back(l);
                adj[l].push_back(k);
                any = true;
            }
    if (!any) return;
    Blossom bl(adj);
    bl.max_matching();
    for (int k = 0; k < np; ++k)
        if (bl.match[k] > k) pairs.emplace_back(ua[k], ua[bl.match[k]]);
}

// Total formal charge with the reference's carbene bookkeeping
// (charge_is_OK, xyz2mol.py:225-250); target charge 0.
static int total_charge_of(int n, const std::vector<int>& z,
                           const std::vector<int>& bo,
                           const std::vector<int>& boval) {
    int q = 0;
    for (int i = 0; i < n; ++i) {
        int c = atomic_charge_of(z[i], boval[i]);
        q += c;
        if (z[i] == 6) {
            int singles = 0;
            for (int j = 0; j < n; ++j)
                if (bo[i * n + j] == 1) ++singles;
            if (singles == 2 && boval[i] == 2) q += 1;
            if (singles == 3 && q + 1 < 0) q += 2;
        }
    }
    return q;
}

// Per-atom charges all zero? (set_atomic_charges rules, xyz2mol.py:443-474.)
static bool charges_all_zero(int n, const std::vector<int>& z,
                             const std::vector<int>& bo,
                             const std::vector<int>& boval) {
    int q = 0;
    for (int i = 0; i < n; ++i) {
        int c = atomic_charge_of(z[i], boval[i]);
        q += c;
        if (z[i] == 6) {
            int singles = 0;
            for (int j = 0; j < n; ++j)
                if (bo[i * n + j] == 1) ++singles;
            if (singles == 2 && boval[i] == 2) { q += 1; c = 0; }
            if (singles == 3 && q + 1 < 0) { q += 2; c = 1; }
        }
        if (c != 0) return false;
    }
    return true;
}

// Verdict for one expanded atom graph (explicit H already added):
// a status-OK bond-order assignment exists AND its formal charges are all
// zero (the resonance criterion — see xyz2mol_bo.py module docstring).
static bool ac2bo_neutral_valid(int n, const std::vector<int>& z,
                                const std::vector<uint8_t>& ac) {
    std::vector<int> acval(n, 0);
    long ac_sum = 0;
    for (int i = 0; i < n; ++i)
        for (int j = 0; j < n; ++j) {
            acval[i] += ac[i * n + j];
            ac_sum += ac[i * n + j];
        }

    int cand[3];
    std::vector<std::array<int, 3>> cands(n);
    std::vector<int> ncand(n);
    for (int i = 0; i < n; ++i) {
        int k = valence_candidates(z[i], cand);
        if (k == 0) return false;
        int kept = 0;
        for (int c = 0; c < k; ++c)
            if (cand[c] >= acval[i]) cands[i][kept++] = cand[c];
        if (kept == 0) return false;  // reference sys.exit()s; judge: invalid
        ncand[i] = kept;
    }

    std::vector<int> idx(n, 0), val(n), ua, du, du_save, boval, bo;
    std::vector<std::pair<int, int>> pairs;
    long combos = 0;
    for (;;) {
        if (combos++ >= kMaxCombos) break;
        for (int i = 0; i < n; ++i) val[i] = cands[i][idx[i]];

        ua.clear();
        du.clear();
        long du_sum = 0;
        for (int i = 0; i < n; ++i) {
            int d = val[i] - acval[i];
            if (d > 0) {
                ua.push_back(i);
                du.push_back(d);
                du_sum += d;
            }
        }

        if (ua.empty()) {
            std::vector<int> ac_int(ac.begin(), ac.end());
            if (total_charge_of(n, z, ac_int, acval) == 0)
                return charges_all_zero(n, z, ac_int, acval);
        } else {
            ua_match_pairs(n, ac, ua, pairs);
            bo.assign(ac.begin(), ac.end());
            boval = acval;
            du_save.clear();
            // iterated saturation to a DU fixed point (get_BO)
            while (du_save != du) {
                for (auto& pr : pairs) {
                    ++bo[pr.first * n + pr.second];
                    ++bo[pr.second * n + pr.first];
                    ++boval[pr.first];
                    ++boval[pr.second];
                }
                du_save = du;
                ua.clear();
                du.clear();
                for (int i = 0; i < n; ++i) {
                    int d = val[i] - boval[i];
                    if (d > 0) {
                        ua.push_back(i);
                        du.push_back(d);
                    }
                }
                ua_match_pairs(n, ac, ua, pairs);
            }
            bool not_too_large = true;
            long bo_sum = 0;
            for (int i = 0; i < n; ++i) {
                if (boval[i] > val[i]) not_too_large = false;
                bo_sum += boval[i];
            }
            bool sum_ok = (bo_sum - ac_sum) == du_sum;
            if (not_too_large && sum_ok &&
                total_charge_of(n, z, bo, boval) == 0)
                return charges_all_zero(n, z, bo, boval);
        }

        // odometer advance, rightmost fastest (itertools.product order)
        int p = n - 1;
        while (p >= 0 && idx[p] + 1 >= ncand[p]) --p;
        if (p < 0) break;
        ++idx[p];
        for (int r = p + 1; r < n; ++r) idx[r] = 0;
    }
    return false;
}

}  // namespace

extern "C" {

// Chemical validity of a neutral atom graph (full AC2BO criterion).
//   n            number of atoms (unexpanded: no implicit H)
//   atomic_num   per-atom atomic numbers (H=1, B=5, C=6, N=7, O=8, S=16...)
//   m, bonds     bond list, bonds[2k], bonds[2k+1]
// Semantics identical to gaudi_tpu/eval_chem/valence.py::valence_valid:
// single connected fragment; add one explicit H to every degree-2 carbon
// (reference build_molecule_aromatic, gor2goa.py:288-293); then a
// status-OK AC2BO assignment must exist with all formal charges zero.
int gaudi_valence_valid(int n, const int32_t* atomic_num, int m,
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

    // expand: one explicit H on each degree-2 carbon
    int extra = 0;
    for (int i = 0; i < n; ++i)
        if (atomic_num[i] == 6 && deg[i] == 2) ++extra;
    int ne = n + extra;
    std::vector<int> z(ne);
    for (int i = 0; i < n; ++i) z[i] = atomic_num[i];
    std::vector<uint8_t> ac(ne * ne, 0);
    for (int k = 0; k < m; ++k) {
        int a = bonds[2 * k], b = bonds[2 * k + 1];
        ac[a * ne + b] = ac[b * ne + a] = 1;
    }
    int h = n;
    for (int i = 0; i < n; ++i)
        if (atomic_num[i] == 6 && deg[i] == 2) {
            z[h] = 1;
            ac[i * ne + h] = ac[h * ne + i] = 1;
            ++h;
        }
    return ac2bo_neutral_valid(ne, z, ac) ? 1 : 0;
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
                       const int64_t* bonds_off, const int32_t* atomic_num,
                       const uint64_t* labels,
                       const int32_t* bonds, int wl_iterations,
                       uint8_t* valid_out, uint64_t* hash_out) {
    for (int i = 0; i < n_mols; ++i) {
        int na = (int)(atoms_off[i + 1] - atoms_off[i]);
        int nb = (int)(bonds_off[i + 1] - bonds_off[i]);
        const int32_t* b = bonds + 2 * bonds_off[i];
        valid_out[i] = (uint8_t)gaudi_valence_valid(
            na, atomic_num + atoms_off[i], nb, b);
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
            // symmetry-periodic circular mean over ALL neighbors (matches
            // the python path: ring-order-invariant, distortion-tolerant;
            // an all-C k-gon template is invariant under 2pi/k rotation)
            double ss = 0.0, cc = 0.0;
            int nn = 0;
            double m = (double)k;
            for (int j = 0; j < n; ++j) {
                if (adj[i * n + j]) {
                    double th =
                        std::atan2(xy[2 * j + 1] - cy, xy[2 * j] - cx);
                    ss += std::sin(m * th);
                    cc += std::cos(m * th);
                    ++nn;
                }
            }
            angle = nn ? std::atan2(ss, cc) / m : 0.0;
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
