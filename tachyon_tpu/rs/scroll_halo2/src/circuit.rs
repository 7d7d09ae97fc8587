//! Circuit description builders that serialize to the backend's JSON schema
//! (tachyon_tpu/c/api.h `circuit_json`).
//!
//! Mirrors the configuration surface of the reference's
//! `vendors/scroll_halo2/src/circuits/*` (columns, simple/complex selectors,
//! equality, gates as expression trees, lookups, shuffles) without forking
//! halo2_proofs: the types here are the minimal frontend the backend's
//! constraint system understands.

use serde::Serialize;

/// Polynomial commitment scheme for the opening argument.
#[derive(Clone, Copy, Debug, PartialEq, Eq)]
pub enum Pcs {
    Shplonk,
    Gwc,
}

impl Pcs {
    fn as_str(self) -> &'static str {
        match self {
            Pcs::Shplonk => "shplonk",
            Pcs::Gwc => "gwc",
        }
    }
}

/// Column families of the plonkish table.
#[derive(Clone, Copy, Debug, PartialEq, Eq)]
pub enum ColumnKind {
    Advice,
    Fixed,
    Instance,
}

impl ColumnKind {
    fn as_str(self) -> &'static str {
        match self {
            ColumnKind::Advice => "advice",
            ColumnKind::Fixed => "fixed",
            ColumnKind::Instance => "instance",
        }
    }
}

/// Gate/lookup expression tree (reference: halo2 `Expression<F>`; the JSON
/// encoding is the `<expr>` grammar in tachyon_tpu/c/api.h).
#[derive(Clone, Debug)]
pub enum Expr {
    /// Field constant (decimal string to cover the full BN254 Fr range).
    Const(String),
    Fixed { col: usize, rot: i32 },
    Advice { col: usize, rot: i32 },
    Instance { col: usize, rot: i32 },
    Challenge { idx: usize, phase: u8 },
    Selector(usize),
    Neg(Box<Expr>),
    Sum(Box<Expr>, Box<Expr>),
    Prod(Box<Expr>, Box<Expr>),
    Scaled(Box<Expr>, String),
}

impl Expr {
    pub fn constant(v: u64) -> Expr {
        Expr::Const(v.to_string())
    }

    pub fn advice(col: usize, rot: i32) -> Expr {
        Expr::Advice { col, rot }
    }

    pub fn fixed(col: usize, rot: i32) -> Expr {
        Expr::Fixed { col, rot }
    }

    pub fn instance(col: usize, rot: i32) -> Expr {
        Expr::Instance { col, rot }
    }

    pub fn selector(idx: usize) -> Expr {
        Expr::Selector(idx)
    }

    pub fn neg(self) -> Expr {
        Expr::Neg(Box::new(self))
    }

    pub fn sum(self, rhs: Expr) -> Expr {
        Expr::Sum(Box::new(self), Box::new(rhs))
    }

    pub fn prod(self, rhs: Expr) -> Expr {
        Expr::Prod(Box::new(self), Box::new(rhs))
    }

    fn to_json(&self) -> serde_json::Value {
        use serde_json::json;
        match self {
            Expr::Const(v) => json!(["const", v.parse::<serde_json::Number>()
                .map(serde_json::Value::Number)
                .unwrap_or_else(|_| serde_json::Value::String(v.clone()))]),
            Expr::Fixed { col, rot } => json!(["fixed", col, rot]),
            Expr::Advice { col, rot } => json!(["advice", col, rot]),
            Expr::Instance { col, rot } => json!(["instance", col, rot]),
            Expr::Challenge { idx, phase } => json!(["challenge", idx, phase]),
            Expr::Selector(idx) => json!(["selector", idx]),
            Expr::Neg(e) => json!(["neg", e.to_json()]),
            Expr::Sum(a, b) => json!(["sum", a.to_json(), b.to_json()]),
            Expr::Prod(a, b) => json!(["prod", a.to_json(), b.to_json()]),
            Expr::Scaled(e, v) => json!(["scaled", e.to_json(), v]),
        }
    }
}

/// One lookup argument: input expressions matched against table expressions
/// (reference: halo2 `ConstraintSystem::lookup`).
#[derive(Clone, Debug, Default)]
pub struct LookupSpec {
    pub name: String,
    pub inputs: Vec<Expr>,
    pub tables: Vec<Expr>,
}

/// One shuffle argument (reference: scroll halo2 `ConstraintSystem::shuffle`).
#[derive(Clone, Debug, Default)]
pub struct ShuffleSpec {
    pub name: String,
    pub inputs: Vec<Expr>,
    pub shuffles: Vec<Expr>,
}

#[derive(Clone, Copy, Debug, Serialize)]
enum SelectorKind {
    #[serde(rename = "simple")]
    Simple,
    #[serde(rename = "complex")]
    Complex,
}

/// Builds the backend circuit description: configuration (columns, gates,
/// lookups) plus the synthesized assignment (cell values, selector bits,
/// copy constraints) — the output of halo2's `FloorPlanner::synthesize`.
#[derive(Debug)]
pub struct CircuitBuilder {
    k: u32,
    pcs: Pcs,
    lookup_type: &'static str,
    num_advice: usize,
    num_fixed: usize,
    num_instance: usize,
    equality: Vec<(ColumnKind, usize)>,
    constants: Vec<(ColumnKind, usize)>,
    selectors: Vec<SelectorKind>,
    gates: Vec<Vec<Expr>>,
    lookups: Vec<LookupSpec>,
    shuffles: Vec<ShuffleSpec>,
    advice_values: Vec<Vec<String>>,
    fixed_values: Vec<Vec<String>>,
    selector_bits: Vec<Vec<u8>>,
    copies: Vec<((ColumnKind, usize, usize), (ColumnKind, usize, usize))>,
    instances: Vec<Vec<String>>,
}

impl CircuitBuilder {
    pub fn new(k: u32, pcs: Pcs) -> Self {
        CircuitBuilder {
            k,
            pcs,
            lookup_type: "halo2",
            num_advice: 0,
            num_fixed: 0,
            num_instance: 0,
            equality: Vec::new(),
            constants: Vec::new(),
            selectors: Vec::new(),
            gates: Vec::new(),
            lookups: Vec::new(),
            shuffles: Vec::new(),
            advice_values: Vec::new(),
            fixed_values: Vec::new(),
            selector_bits: Vec::new(),
            copies: Vec::new(),
            instances: Vec::new(),
        }
    }

    /// Switches the lookup argument to the log-derivative flavor
    /// (reference: halo2 `mv_lookup`).
    pub fn log_derivative_lookups(&mut self) -> &mut Self {
        self.lookup_type = "log_derivative";
        self
    }

    pub fn advice_column(&mut self) -> usize {
        self.num_advice += 1;
        self.advice_values.push(Vec::new());
        self.num_advice - 1
    }

    pub fn fixed_column(&mut self) -> usize {
        self.num_fixed += 1;
        self.fixed_values.push(Vec::new());
        self.num_fixed - 1
    }

    pub fn instance_column(&mut self) -> usize {
        self.num_instance += 1;
        self.instances.push(Vec::new());
        self.num_instance - 1
    }

    pub fn simple_selector(&mut self) -> usize {
        self.selectors.push(SelectorKind::Simple);
        self.selector_bits.push(Vec::new());
        self.selectors.len() - 1
    }

    pub fn complex_selector(&mut self) -> usize {
        self.selectors.push(SelectorKind::Complex);
        self.selector_bits.push(Vec::new());
        self.selectors.len() - 1
    }

    pub fn enable_equality(&mut self, kind: ColumnKind, col: usize) {
        self.equality.push((kind, col));
    }

    pub fn enable_constant(&mut self, col: usize) {
        self.constants.push((ColumnKind::Fixed, col));
    }

    pub fn gate(&mut self, polys: Vec<Expr>) {
        self.gates.push(polys);
    }

    pub fn lookup(&mut self, spec: LookupSpec) {
        self.lookups.push(spec);
    }

    pub fn shuffle(&mut self, spec: ShuffleSpec) {
        self.shuffles.push(spec);
    }

    // -- synthesis (assignment) ------------------------------------------

    fn set(values: &mut Vec<String>, row: usize, v: impl ToString) {
        if values.len() <= row {
            values.resize(row + 1, "0".to_string());
        }
        values[row] = v.to_string();
    }

    pub fn assign_advice(&mut self, col: usize, row: usize, v: impl ToString) {
        Self::set(&mut self.advice_values[col], row, v);
    }

    pub fn assign_fixed(&mut self, col: usize, row: usize, v: impl ToString) {
        Self::set(&mut self.fixed_values[col], row, v);
    }

    pub fn enable_selector(&mut self, sel: usize, row: usize) {
        let bits = &mut self.selector_bits[sel];
        if bits.len() <= row {
            bits.resize(row + 1, 0);
        }
        bits[row] = 1;
    }

    pub fn copy(
        &mut self,
        a: (ColumnKind, usize, usize),
        b: (ColumnKind, usize, usize),
    ) {
        self.copies.push((a, b));
    }

    pub fn set_instance(&mut self, col: usize, row: usize, v: impl ToString) {
        Self::set(&mut self.instances[col], row, v);
    }

    /// Serializes to the backend's `circuit_json` schema.
    pub fn to_json(&self) -> String {
        use serde_json::json;
        let num = |s: &str| -> serde_json::Value {
            s.parse::<serde_json::Number>()
                .map(serde_json::Value::Number)
                .unwrap_or_else(|_| serde_json::Value::String(s.to_string()))
        };
        let cols = |v: &[(ColumnKind, usize)]| -> Vec<serde_json::Value> {
            v.iter().map(|(k, i)| json!([k.as_str(), i])).collect()
        };
        let vals = |cols: &[Vec<String>]| -> Vec<Vec<serde_json::Value>> {
            cols.iter()
                .map(|c| c.iter().map(|v| num(v)).collect())
                .collect()
        };
        let spec = json!({
            "k": self.k,
            "pcs": self.pcs.as_str(),
            "lookup_type": self.lookup_type,
            "num_advice": self.num_advice,
            "num_fixed": self.num_fixed,
            "num_instance": self.num_instance,
            "equality": cols(&self.equality),
            "constants": cols(&self.constants),
            "selectors": self.selectors,
            "gates": self.gates.iter().map(|g| {
                g.iter().map(|e| e.to_json()).collect::<Vec<_>>()
            }).collect::<Vec<_>>(),
            "lookups": self.lookups.iter().map(|l| json!({
                "name": l.name,
                "inputs": l.inputs.iter().map(|e| e.to_json())
                    .collect::<Vec<_>>(),
                "tables": l.tables.iter().map(|e| e.to_json())
                    .collect::<Vec<_>>(),
            })).collect::<Vec<_>>(),
            "shuffles": self.shuffles.iter().map(|s| json!({
                "name": s.name,
                "inputs": s.inputs.iter().map(|e| e.to_json())
                    .collect::<Vec<_>>(),
                "shuffles": s.shuffles.iter().map(|e| e.to_json())
                    .collect::<Vec<_>>(),
            })).collect::<Vec<_>>(),
            "assignments": {
                "advice": vals(&self.advice_values),
                "fixed": vals(&self.fixed_values),
                "selectors": self.selector_bits,
                "copies": self.copies.iter().map(|(a, b)| json!([
                    [a.0.as_str(), a.1, a.2],
                    [b.0.as_str(), b.1, b.2],
                ])).collect::<Vec<_>>(),
            },
            "instances": vals(&self.instances),
        });
        spec.to_string()
    }
}
