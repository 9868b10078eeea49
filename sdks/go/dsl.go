// Package helixtpu is the Go SDK for the helix-tpu engine.
//
// Mirrors the dynamic-query wire format of the Python SDK
// (helix_tpu/dsl.py) and the reference Go SDK surface (reference:
// sdks/go/dsl.go): externally tagged enum JSON built eagerly, G()
// traversal builder, ReadBatch/WriteBatch assembly, typed parameters.
//
// uint64 node/edge ids marshal losslessly through encoding/json.
package helixtpu

import (
	"encoding/json"
	"fmt"
	"math"
	"time"
)

// J is the building block for wire-format JSON values.
type J = interface{}

// ---------------------------------------------------------------------------
// Property values
// ---------------------------------------------------------------------------

// Tagged wraps an explicit PropertyValue variant.
type Tagged struct {
	Tag   string
	Value J
}

// I64 pins an integer property value variant.
func I64(v int64) Tagged { return Tagged{"I64", v} }

// F64 pins a float64 property value variant.
func F64(v float64) Tagged { return Tagged{"F64", v} }

// F32 pins a float32 property value variant.
func F32(v float64) Tagged { return Tagged{"F32", v} }

// Str pins a string property value variant.
func Str(v string) Tagged { return Tagged{"String", v} }

// Bytes pins a bytes property value variant.
func Bytes(v []byte) Tagged {
	ints := make([]int, len(v))
	for i, b := range v {
		ints[i] = int(b)
	}
	return Tagged{"Bytes", ints}
}

// DateTimeMillis pins a DateTime property value variant.
func DateTimeMillis(millis int64) Tagged { return Tagged{"DateTime", millis} }

// F32Array pins a float32-array property value variant (vectors).
func F32Array(v []float64) Tagged { return Tagged{"F32Array", v} }

// EncodePropertyValue coerces a Go value to an encoded PropertyValue.
func EncodePropertyValue(value interface{}) J {
	switch v := value.(type) {
	case Tagged:
		if v.Tag == "Null" {
			return "Null"
		}
		return map[string]J{v.Tag: v.Value}
	case nil:
		return "Null"
	case bool:
		return map[string]J{"Bool": v}
	case int:
		return map[string]J{"I64": v}
	case int64:
		return map[string]J{"I64": v}
	case uint64:
		return map[string]J{"I64": v}
	case float64:
		if v == math.Trunc(v) && math.Abs(v) < 1e15 {
			// Go literals like 2.5 stay floats; whole float64s are
			// still F64 (callers wanting I64 pass ints).
			return map[string]J{"F64": v}
		}
		return map[string]J{"F64": v}
	case float32:
		return map[string]J{"F64": float64(v)}
	case string:
		return map[string]J{"String": v}
	case []byte:
		return map[string]J{"Bytes": v}
	case time.Time:
		return map[string]J{"DateTime": v.UnixMilli()}
	case []string:
		return map[string]J{"StringArray": v}
	case []int:
		return map[string]J{"I64Array": v}
	case []int64:
		return map[string]J{"I64Array": v}
	case []float64:
		return map[string]J{"F64Array": v}
	case []interface{}:
		items := make([]J, len(v))
		for i, item := range v {
			items[i] = EncodePropertyValue(item)
		}
		return map[string]J{"Array": items}
	case map[string]interface{}:
		obj := make(map[string]J, len(v))
		for key, item := range v {
			obj[key] = EncodePropertyValue(item)
		}
		return map[string]J{"Object": obj}
	default:
		panic(fmt.Sprintf("unsupported property value %T", value))
	}
}

// ---------------------------------------------------------------------------
// Expressions
// ---------------------------------------------------------------------------

// Expr is an encoded expression node.
type Expr struct{ Node J }

// Prop reads a property of the current element.
func Prop(name string) Expr { return Expr{map[string]J{"Property": name}} }

// Val wraps a constant.
func Val(value interface{}) Expr {
	return Expr{map[string]J{"Constant": EncodePropertyValue(value)}}
}

// Param references a dynamic parameter.
func Param(name string) Expr { return Expr{map[string]J{"Param": name}} }

// ExprID is the current element id expression.
func ExprID() Expr { return Expr{"Id"} }

// Timestamp is the current epoch-millis expression.
func Timestamp() Expr { return Expr{"Timestamp"} }

// DateTimeNow is the current DateTime expression.
func DateTimeNow() Expr { return Expr{"DateTimeNow"} }

func (e Expr) bin(tag string, other Expr) Expr {
	return Expr{map[string]J{tag: []J{e.Node, other.Node}}}
}

// Add returns e + other.
func (e Expr) Add(other Expr) Expr { return e.bin("Add", other) }

// Sub returns e - other.
func (e Expr) Sub(other Expr) Expr { return e.bin("Sub", other) }

// Mul returns e * other.
func (e Expr) Mul(other Expr) Expr { return e.bin("Mul", other) }

// Div returns e / other.
func (e Expr) Div(other Expr) Expr { return e.bin("Div", other) }

// Mod returns e % other.
func (e Expr) Mod(other Expr) Expr { return e.bin("Mod", other) }

// Neg returns -e.
func (e Expr) Neg() Expr { return Expr{map[string]J{"Neg": e.Node}} }

func asInput(value interface{}) J {
	switch v := value.(type) {
	case Expr:
		return map[string]J{"Expr": v.Node}
	default:
		return map[string]J{"Value": EncodePropertyValue(value)}
	}
}

func asBound(value interface{}) J {
	switch v := value.(type) {
	case Expr:
		return map[string]J{"Expr": v.Node}
	case int:
		return map[string]J{"Literal": v}
	case int64:
		return map[string]J{"Literal": v}
	default:
		panic(fmt.Sprintf("unsupported stream bound %T", value))
	}
}

// ---------------------------------------------------------------------------
// Predicates
// ---------------------------------------------------------------------------

// Predicate is an encoded filter predicate.
type Predicate struct{ Node J }

func cmp(tag, prop string, value interface{}) Predicate {
	if expr, ok := value.(Expr); ok {
		exprTags := map[string]string{
			"Eq": "EqExpr", "Neq": "NeqExpr", "Gt": "GtExpr",
			"Gte": "GteExpr", "Lt": "LtExpr", "Lte": "LteExpr",
		}
		return Predicate{map[string]J{exprTags[tag]: []J{prop, expr.Node}}}
	}
	return Predicate{map[string]J{tag: []J{prop, EncodePropertyValue(value)}}}
}

// Eq matches prop == value.
func Eq(prop string, value interface{}) Predicate { return cmp("Eq", prop, value) }

// Neq matches prop != value.
func Neq(prop string, value interface{}) Predicate { return cmp("Neq", prop, value) }

// Gt matches prop > value.
func Gt(prop string, value interface{}) Predicate { return cmp("Gt", prop, value) }

// Gte matches prop >= value.
func Gte(prop string, value interface{}) Predicate { return cmp("Gte", prop, value) }

// Lt matches prop < value.
func Lt(prop string, value interface{}) Predicate { return cmp("Lt", prop, value) }

// Lte matches prop <= value.
func Lte(prop string, value interface{}) Predicate { return cmp("Lte", prop, value) }

// Between matches lo <= prop <= hi.
func Between(prop string, lo, hi interface{}) Predicate {
	_, loExpr := lo.(Expr)
	_, hiExpr := hi.(Expr)
	if loExpr || hiExpr {
		toExpr := func(v interface{}) J {
			if e, ok := v.(Expr); ok {
				return e.Node
			}
			return Val(v).Node
		}
		return Predicate{map[string]J{"BetweenExpr": []J{prop, toExpr(lo), toExpr(hi)}}}
	}
	return Predicate{map[string]J{
		"Between": []J{prop, EncodePropertyValue(lo), EncodePropertyValue(hi)},
	}}
}

// HasKeyPred matches elements carrying the property.
func HasKeyPred(prop string) Predicate { return Predicate{map[string]J{"HasKey": prop}} }

// IsNull matches absent or null properties.
func IsNull(prop string) Predicate { return Predicate{map[string]J{"IsNull": prop}} }

// IsNotNull matches present, non-null properties.
func IsNotNull(prop string) Predicate { return Predicate{map[string]J{"IsNotNull": prop}} }

// StartsWith matches string prefixes.
func StartsWith(prop, prefix string) Predicate {
	return Predicate{map[string]J{"StartsWith": []J{prop, prefix}}}
}

// EndsWith matches string suffixes.
func EndsWith(prop, suffix string) Predicate {
	return Predicate{map[string]J{"EndsWith": []J{prop, suffix}}}
}

// Contains matches string substrings.
func Contains(prop, needle string) Predicate {
	return Predicate{map[string]J{"Contains": []J{prop, needle}}}
}

// IsIn matches membership in an array value.
func IsIn(prop string, values interface{}) Predicate {
	return Predicate{map[string]J{"IsIn": []J{prop, EncodePropertyValue(values)}}}
}

// ContainsExpr matches substrings resolved from an expression.
func ContainsExpr(prop string, expr Expr) Predicate {
	return Predicate{map[string]J{"ContainsExpr": []J{prop, expr.Node}}}
}

// IsInExpr matches membership in an expression-resolved array.
func IsInExpr(prop string, expr Expr) Predicate {
	return Predicate{map[string]J{"IsInExpr": []J{prop, expr.Node}}}
}

// And combines predicates conjunctively.
func And(predicates ...Predicate) Predicate {
	nodes := make([]J, len(predicates))
	for i, p := range predicates {
		nodes[i] = p.Node
	}
	return Predicate{map[string]J{"And": nodes}}
}

// Or combines predicates disjunctively.
func Or(predicates ...Predicate) Predicate {
	nodes := make([]J, len(predicates))
	for i, p := range predicates {
		nodes[i] = p.Node
	}
	return Predicate{map[string]J{"Or": nodes}}
}

// Not inverts a predicate.
func Not(p Predicate) Predicate { return Predicate{map[string]J{"Not": p.Node}} }

// Compare compares two expressions.
func Compare(left Expr, op string, right Expr) Predicate {
	return Predicate{map[string]J{"Compare": map[string]J{
		"left": left.Node, "op": op, "right": right.Node,
	}}}
}

// ---------------------------------------------------------------------------
// Refs / projections / index specs
// ---------------------------------------------------------------------------

// NodeAll selects every node.
var NodeAll J = "All"

// NodeIDs selects nodes by id.
func NodeIDs(ids ...uint64) J { return map[string]J{"Ids": ids} }

// NodeVar re-seeds from a batch variable.
func NodeVar(name string) J { return map[string]J{"Var": name} }

// NodeParam resolves ids from a parameter.
func NodeParam(name string) J { return map[string]J{"Param": name} }

// EdgeIDs selects edges by id.
func EdgeIDs(ids ...uint64) J { return map[string]J{"Ids": ids} }

// EdgeVar re-seeds edges from a batch variable.
func EdgeVar(name string) J { return map[string]J{"Var": name} }

// ProjectProp projects a property under an alias.
func ProjectProp(source, alias string) J {
	return map[string]J{"source": source, "alias": alias}
}

// ProjectExpr projects an expression under an alias.
func ProjectExpr(alias string, expr Expr) J {
	return map[string]J{"alias": alias, "expr": expr.Node}
}

// NodeEqualityIndex declares an equality index spec.
func NodeEqualityIndex(label, property string, unique bool) J {
	return map[string]J{"NodeEquality": map[string]J{
		"label": label, "property": property, "unique": unique,
	}}
}

// NodeRangeIndex declares a range index spec.
func NodeRangeIndex(label, property string) J {
	return map[string]J{"NodeRange": map[string]J{"label": label, "property": property}}
}

// NodeVectorIndex declares a vector index spec.
func NodeVectorIndex(label, property, tenantProperty string) J {
	fields := map[string]J{"label": label, "property": property}
	if tenantProperty != "" {
		fields["tenant_property"] = tenantProperty
	}
	return map[string]J{"NodeVector": fields}
}

// NodeRangeIndexDesc declares a descending range index spec.
func NodeRangeIndexDesc(label, property string) J {
	return map[string]J{"NodeRange": map[string]J{
		"label": label, "property": property, "direction": "Desc",
	}}
}

// EdgeEqualityIndex declares an edge equality index spec.
func EdgeEqualityIndex(label, property string) J {
	return map[string]J{"EdgeEquality": map[string]J{"label": label, "property": property}}
}

// EdgeRangeIndex declares an edge range index spec.
func EdgeRangeIndex(label, property string) J {
	return map[string]J{"EdgeRange": map[string]J{"label": label, "property": property}}
}

// EdgeVectorIndex declares an edge vector index spec.
func EdgeVectorIndex(label, property, tenantProperty string) J {
	fields := map[string]J{"label": label, "property": property}
	if tenantProperty != "" {
		fields["tenant_property"] = tenantProperty
	}
	return map[string]J{"EdgeVector": fields}
}

// EdgeTextIndex declares an edge BM25 text index spec.
func EdgeTextIndex(label, property, tenantProperty string) J {
	fields := map[string]J{"label": label, "property": property}
	if tenantProperty != "" {
		fields["tenant_property"] = tenantProperty
	}
	return map[string]J{"EdgeText": fields}
}

// NodeTextIndex declares a BM25 text index spec.
func NodeTextIndex(label, property, tenantProperty string) J {
	fields := map[string]J{"label": label, "property": property}
	if tenantProperty != "" {
		fields["tenant_property"] = tenantProperty
	}
	return map[string]J{"NodeText": fields}
}

// ---------------------------------------------------------------------------
// Traversals
// ---------------------------------------------------------------------------

// Traversal is an immutable step chain; every method returns a new value.
type Traversal struct {
	Steps []J
	Write bool
}

// G starts an empty traversal.
func G() Traversal { return Traversal{} }

func (t Traversal) push(step J) Traversal {
	steps := make([]J, len(t.Steps)+1)
	copy(steps, t.Steps)
	steps[len(t.Steps)] = step
	return Traversal{Steps: steps, Write: t.Write}
}

func (t Traversal) pushWrite(step J) Traversal {
	next := t.push(step)
	next.Write = true
	return next
}

// N seeds from a node ref.
func (t Traversal) N(ref J) Traversal { return t.push(map[string]J{"N": ref}) }

// NWhere seeds from an index-friendly source predicate.
func (t Traversal) NWhere(p Predicate) Traversal {
	return t.push(map[string]J{"NWhere": p.Node})
}

// NWithLabel seeds all nodes of a label.
func (t Traversal) NWithLabel(label string) Traversal {
	return t.NWhere(Eq("$label", label))
}

// E seeds from an edge ref.
func (t Traversal) E(ref J) Traversal { return t.push(map[string]J{"E": ref}) }

// EWhere seeds edges from a source predicate.
func (t Traversal) EWhere(p Predicate) Traversal {
	return t.push(map[string]J{"EWhere": p.Node})
}

// EWithLabel seeds all edges of a label.
func (t Traversal) EWithLabel(label string) Traversal {
	return t.EWhere(Eq("$label", label))
}

// VectorSearchNodes seeds from a vector top-k search.
func (t Traversal) VectorSearchNodes(label, property string, query []float64, k int) Traversal {
	return t.push(map[string]J{"VectorSearchNodes": map[string]J{
		"label": label, "property": property,
		"query_vector": map[string]J{"Value": map[string]J{"F32Array": query}},
		"k":            map[string]J{"Literal": k},
	}})
}

// TextSearchNodes seeds from a BM25 top-k search.
func (t Traversal) TextSearchNodes(label, property, queryText string, k int) Traversal {
	return t.push(map[string]J{"TextSearchNodes": map[string]J{
		"label": label, "property": property,
		"query_text": map[string]J{"Value": map[string]J{"String": queryText}},
		"k":          map[string]J{"Literal": k},
	}})
}

// VectorSearchEdges seeds from an edge vector top-k search.
func (t Traversal) VectorSearchEdges(label, property string, query []float64, k int) Traversal {
	return t.push(map[string]J{"VectorSearchEdges": map[string]J{
		"label": label, "property": property,
		"query_vector": map[string]J{"Value": map[string]J{"F32Array": query}},
		"k":            map[string]J{"Literal": k},
	}})
}

// VectorSearchEdgesTenant seeds an edge vector search in a tenant partition.
func (t Traversal) VectorSearchEdgesTenant(label, property string, query []float64, k int, tenantValue interface{}) Traversal {
	return t.push(map[string]J{"VectorSearchEdges": map[string]J{
		"label": label, "property": property,
		"tenant_value": asInput(tenantValue),
		"query_vector": map[string]J{"Value": map[string]J{"F32Array": query}},
		"k":            map[string]J{"Literal": k},
	}})
}

// TextSearchEdges seeds from an edge BM25 top-k search.
func (t Traversal) TextSearchEdges(label, property, queryText string, k int) Traversal {
	return t.push(map[string]J{"TextSearchEdges": map[string]J{
		"label": label, "property": property,
		"query_text": map[string]J{"Value": map[string]J{"String": queryText}},
		"k":          map[string]J{"Literal": k},
	}})
}

// Out walks outgoing edges to their targets ("" = any label).
func (t Traversal) Out(label string) Traversal { return t.push(map[string]J{"Out": nilable(label)}) }

// In walks incoming edges to their sources.
func (t Traversal) In(label string) Traversal { return t.push(map[string]J{"In": nilable(label)}) }

// Both walks edges in both directions.
func (t Traversal) Both(label string) Traversal { return t.push(map[string]J{"Both": nilable(label)}) }

// OutE walks to outgoing edges.
func (t Traversal) OutE(label string) Traversal { return t.push(map[string]J{"OutE": nilable(label)}) }

// InE walks to incoming edges.
func (t Traversal) InE(label string) Traversal { return t.push(map[string]J{"InE": nilable(label)}) }

// BothE walks to edges in both directions.
func (t Traversal) BothE(label string) Traversal {
	return t.push(map[string]J{"BothE": nilable(label)})
}

// OutN walks edges to their source nodes.
func (t Traversal) OutN() Traversal { return t.push("OutN") }

// InN walks edges to their target nodes.
func (t Traversal) InN() Traversal { return t.push("InN") }

// OtherN walks edges to their far endpoints.
func (t Traversal) OtherN() Traversal { return t.push("OtherN") }

func nilable(label string) J {
	if label == "" {
		return nil
	}
	return label
}

// Has filters on property equality.
func (t Traversal) Has(prop string, value interface{}) Traversal {
	return t.push(map[string]J{"Has": []J{prop, EncodePropertyValue(value)}})
}

// HasLabel filters on element label.
func (t Traversal) HasLabel(label string) Traversal {
	return t.push(map[string]J{"HasLabel": label})
}

// EdgeHas filters edges on a property input (value or expression).
func (t Traversal) EdgeHas(prop string, value interface{}) Traversal {
	return t.push(map[string]J{"EdgeHas": []J{prop, asInput(value)}})
}

// EdgeHasLabel filters edges on label.
func (t Traversal) EdgeHasLabel(label string) Traversal {
	return t.push(map[string]J{"EdgeHasLabel": label})
}

// Where filters on a predicate.
func (t Traversal) Where(p Predicate) Traversal {
	return t.push(map[string]J{"Where": p.Node})
}

// Dedup keeps first occurrences.
func (t Traversal) Dedup() Traversal { return t.push("Dedup") }

// Within keeps elements present in a stored variable.
func (t Traversal) Within(name string) Traversal { return t.push(map[string]J{"Within": name}) }

// Without keeps elements absent from a stored variable.
func (t Traversal) Without(name string) Traversal { return t.push(map[string]J{"Without": name}) }

// Limit truncates the stream.
func (t Traversal) Limit(n interface{}) Traversal {
	bound := asBound(n)
	if m, ok := bound.(map[string]J); ok {
		if lit, ok := m["Literal"]; ok {
			return t.push(map[string]J{"Limit": lit})
		}
		return t.push(map[string]J{"LimitBy": m["Expr"]})
	}
	return t
}

// Skip drops leading elements.
func (t Traversal) Skip(n int) Traversal { return t.push(map[string]J{"Skip": n}) }

// Range keeps elements in [start, end).
func (t Traversal) Range(start, end int) Traversal {
	return t.push(map[string]J{"Range": []J{start, end}})
}

// RangeBy keeps elements in an expression-bounded window.
func (t Traversal) RangeBy(start, end interface{}) Traversal {
	return t.push(map[string]J{"RangeBy": []J{asBound(start), asBound(end)}})
}

// OrderBy sorts the stream by a property.
func (t Traversal) OrderBy(prop, order string) Traversal {
	return t.push(map[string]J{"OrderBy": []J{prop, order}})
}

// As names the current stream for Select.
func (t Traversal) As(name string) Traversal { return t.push(map[string]J{"As": name}) }

// Store saves the current stream to the batch scope.
func (t Traversal) Store(name string) Traversal { return t.push(map[string]J{"Store": name}) }

// Select restores a named stream.
func (t Traversal) Select(name string) Traversal { return t.push(map[string]J{"Select": name}) }

// Bind captures the stream as a row-local binding (wire v5).
func (t Traversal) Bind(name string) Traversal { return t.push(map[string]J{"Bind": name}) }

// Count terminates with the element count.
func (t Traversal) Count() Traversal { return t.push("Count") }

// Exists terminates with stream non-emptiness.
func (t Traversal) Exists() Traversal { return t.push("Exists") }

// IDs terminates with element ids.
func (t Traversal) IDs() Traversal { return t.push("Id") }

// Label terminates with element labels.
func (t Traversal) Label() Traversal { return t.push("Label") }

// Values terminates with flattened property values.
func (t Traversal) Values(props ...string) Traversal {
	return t.push(map[string]J{"Values": props})
}

// ValueMap terminates with property maps (nil = all properties).
func (t Traversal) ValueMap(props []string) Traversal {
	if props == nil {
		return t.push(map[string]J{"ValueMap": nil})
	}
	return t.push(map[string]J{"ValueMap": props})
}

// Project terminates with renamed/expression projections.
func (t Traversal) Project(projections ...J) Traversal {
	return t.push(map[string]J{"Project": projections})
}

// EdgeProperties terminates with edge rows.
func (t Traversal) EdgeProperties() Traversal { return t.push("EdgeProperties") }

// GroupCount terminates with value counts keyed by a property.
func (t Traversal) GroupCount(prop string) Traversal {
	return t.push(map[string]J{"GroupCount": prop})
}

// AggregateBy terminates with Count/Sum/Min/Max/Mean over a property.
func (t Traversal) AggregateBy(fn, prop string) Traversal {
	return t.push(map[string]J{"AggregateBy": []J{fn, prop}})
}

// DropIndex drops a declared index.
func (t Traversal) DropIndex(spec J) Traversal {
	return t.pushWrite(map[string]J{"DropIndex": map[string]J{"spec": spec}})
}

// CreateIndexIfNotExists declares an index.
func (t Traversal) CreateIndexIfNotExists(spec J) Traversal {
	return t.pushWrite(map[string]J{"CreateIndex": map[string]J{
		"spec": spec, "if_not_exists": true,
	}})
}

// CreateVectorIndexNodes declares a node vector index.
func (t Traversal) CreateVectorIndexNodes(label, property, tenantProperty string) Traversal {
	return t.CreateIndexIfNotExists(NodeVectorIndex(label, property, tenantProperty))
}

// CreateTextIndexNodes declares a node text index.
func (t Traversal) CreateTextIndexNodes(label, property, tenantProperty string) Traversal {
	return t.CreateIndexIfNotExists(NodeTextIndex(label, property, tenantProperty))
}

// AddN creates a node; it becomes the current stream.
func (t Traversal) AddN(label string, properties map[string]interface{}) Traversal {
	entries := make([]J, 0, len(properties))
	for key, value := range properties {
		entries = append(entries, []J{key, asInput(value)})
	}
	return t.pushWrite(map[string]J{"AddN": map[string]J{
		"label": label, "properties": entries,
	}})
}

// AddE links every current node to the resolved targets.
func (t Traversal) AddE(label string, to J, properties map[string]interface{}) Traversal {
	entries := make([]J, 0, len(properties))
	for key, value := range properties {
		entries = append(entries, []J{key, asInput(value)})
	}
	return t.pushWrite(map[string]J{"AddE": map[string]J{
		"label": label, "to": to, "properties": entries,
	}})
}

// SetProperty writes a property on every current element.
func (t Traversal) SetProperty(name string, value interface{}) Traversal {
	return t.pushWrite(map[string]J{"SetProperty": []J{name, asInput(value)}})
}

// RemoveProperty deletes a property on every current element.
func (t Traversal) RemoveProperty(name string) Traversal {
	return t.pushWrite(map[string]J{"RemoveProperty": name})
}

// Drop deletes the current elements (nodes cascade incident edges).
func (t Traversal) Drop() Traversal { return t.pushWrite("Drop") }

// ---------------------------------------------------------------------------
// Batches / envelope
// ---------------------------------------------------------------------------

// BatchEntry is one named query (or ForEach block) in a batch.
type BatchEntry = J

// Batch assembles named queries; Kind is "read" or "write".
type Batch struct {
	Kind    string
	Queries []BatchEntry
	Returns []string
}

// ReadBatch starts a read-only batch.
func ReadBatch() Batch { return Batch{Kind: "read"} }

// WriteBatch starts a write batch.
func WriteBatch() Batch { return Batch{Kind: "write"} }

// VarAs appends a named query.
func (b Batch) VarAs(name string, t Traversal) Batch {
	if b.Kind == "read" && t.Write {
		panic("ReadBatch only accepts read-only traversals")
	}
	entry := map[string]J{"Query": map[string]J{
		"name": name, "steps": t.Steps, "condition": nil,
	}}
	return Batch{b.Kind, append(append([]BatchEntry{}, b.Queries...), entry), b.Returns}
}

// VarAsIf appends a conditionally executed named query.
func (b Batch) VarAsIf(name string, condition J, t Traversal) Batch {
	entry := map[string]J{"Query": map[string]J{
		"name": name, "steps": t.Steps, "condition": condition,
	}}
	return Batch{b.Kind, append(append([]BatchEntry{}, b.Queries...), entry), b.Returns}
}

// ForEachParam appends a per-array-element body.
func (b Batch) ForEachParam(paramName string, body Batch) Batch {
	entry := map[string]J{"ForEach": map[string]J{
		"param": paramName, "body": body.Queries,
	}}
	return Batch{b.Kind, append(append([]BatchEntry{}, b.Queries...), entry), b.Returns}
}

// Returning selects the response payload variables.
func (b Batch) Returning(vars ...string) Batch {
	return Batch{b.Kind, b.Queries, vars}
}

// Encode renders the batch body.
func (b Batch) Encode() J {
	queries := b.Queries
	if queries == nil {
		queries = []BatchEntry{}
	}
	returns := b.Returns
	if returns == nil {
		returns = []string{}
	}
	return map[string]J{"queries": queries, "returns": returns}
}

// VarNotEmpty gates on a non-empty variable.
func VarNotEmpty(name string) J { return map[string]J{"VarNotEmpty": name} }

// VarEmpty gates on an empty variable.
func VarEmpty(name string) J { return map[string]J{"VarEmpty": name} }

// VarMinSize gates on a variable's minimum size.
func VarMinSize(name string, size int) J {
	return map[string]J{"VarMinSize": []J{name, size}}
}

// PrevNotEmpty gates on the previous entry's result.
var PrevNotEmpty J = "PrevNotEmpty"

// DynamicQueryRequest is the POST /v1/query envelope.
type DynamicQueryRequest struct {
	RequestType    string       `json:"request_type"`
	QueryName      *string      `json:"query_name"`
	Query          J            `json:"query"`
	Parameters     map[string]J `json:"parameters,omitempty"`
	ParameterTypes map[string]J `json:"parameter_types,omitempty"`
}

// Read wraps a read batch into a request.
func Read(b Batch) *DynamicQueryRequest {
	return &DynamicQueryRequest{RequestType: "read", Query: b.Encode()}
}

// Write wraps a write batch into a request.
func Write(b Batch) *DynamicQueryRequest {
	return &DynamicQueryRequest{RequestType: "write", Query: b.Encode()}
}

// WithQueryName sets the diagnostic query name.
func (r *DynamicQueryRequest) WithQueryName(name string) *DynamicQueryRequest {
	r.QueryName = &name
	return r
}

// WithParameter binds a typed parameter.
func (r *DynamicQueryRequest) WithParameter(name string, ty J, value J) *DynamicQueryRequest {
	if r.Parameters == nil {
		r.Parameters = map[string]J{}
	}
	if r.ParameterTypes == nil {
		r.ParameterTypes = map[string]J{}
	}
	r.Parameters[name] = value
	r.ParameterTypes[name] = ty
	return r
}

// ToJSON serializes the request envelope.
func (r *DynamicQueryRequest) ToJSON() ([]byte, error) {
	return json.Marshal(r)
}

// ---------------------------------------------------------------------------
// Ordered properties (parity generators need deterministic wire output;
// Go map iteration is randomized)
// ---------------------------------------------------------------------------

// PropPair is one (name, value) property entry with stable order.
type PropPair struct {
	Key   string
	Value interface{}
}

// AddNOrdered is AddN with deterministic property order.
func (t Traversal) AddNOrdered(label string, pairs []PropPair) Traversal {
	entries := make([]J, 0, len(pairs))
	for _, p := range pairs {
		entries = append(entries, []J{p.Key, asInput(p.Value)})
	}
	return t.pushWrite(map[string]J{"AddN": map[string]J{
		"label": label, "properties": entries,
	}})
}

// AddEOrdered is AddE with deterministic property order.
func (t Traversal) AddEOrdered(label string, to J, pairs []PropPair) Traversal {
	entries := make([]J, 0, len(pairs))
	for _, p := range pairs {
		entries = append(entries, []J{p.Key, asInput(p.Value)})
	}
	return t.pushWrite(map[string]J{"AddE": map[string]J{
		"label": label, "to": to, "properties": entries,
	}})
}

// ---------------------------------------------------------------------------
// Case expression
// ---------------------------------------------------------------------------

// WhenThen is one (predicate, result) arm of a Case expression.
type WhenThen struct {
	When Predicate
	Then Expr
}

// Case builds a conditional expression with an else arm.
func Case(arms []WhenThen, elseExpr Expr) Expr {
	whenThen := make([]J, 0, len(arms))
	for _, arm := range arms {
		whenThen = append(whenThen, []J{arm.When.Node, arm.Then.Node})
	}
	return Expr{map[string]J{"Case": map[string]J{
		"when_then": whenThen, "else_expr": elseExpr.Node,
	}}}
}

// ---------------------------------------------------------------------------
// Control flow: sub-traversals, Union/Coalesce/Choose/Optional/Repeat
// ---------------------------------------------------------------------------

func subTraversal(t Traversal) J { return map[string]J{"steps": t.Steps} }

// Union runs every branch over the current stream and concatenates.
func (t Traversal) Union(branches ...Traversal) Traversal {
	subs := make([]J, 0, len(branches))
	for _, branch := range branches {
		subs = append(subs, subTraversal(branch))
	}
	return t.push(map[string]J{"Union": subs})
}

// Coalesce takes the first branch that yields any results.
func (t Traversal) Coalesce(branches ...Traversal) Traversal {
	subs := make([]J, 0, len(branches))
	for _, branch := range branches {
		subs = append(subs, subTraversal(branch))
	}
	return t.push(map[string]J{"Coalesce": subs})
}

// Choose branches per element on a predicate; elseBranch may be nil.
func (t Traversal) Choose(condition Predicate, then Traversal, elseBranch *Traversal) Traversal {
	var elseNode J
	if elseBranch != nil {
		elseNode = subTraversal(*elseBranch)
	}
	return t.push(map[string]J{"Choose": map[string]J{
		"condition":       condition.Node,
		"then_traversal":  subTraversal(then),
		"else_traversal":  elseNode,
	}})
}

// Optional runs the branch, keeping the input element when it is empty.
func (t Traversal) Optional(branch Traversal) Traversal {
	return t.push(map[string]J{"Optional": subTraversal(branch)})
}

// RepeatConfig configures a Repeat step; zero value = unbounded with
// the default max depth.
type RepeatConfig struct {
	Traversal     Traversal
	TimesVal      *int
	UntilVal      *Predicate
	Emit          string // "None", "All", "Before", "After"
	EmitPredicate *Predicate
	MaxDepthVal   int
}

// NewRepeat starts a RepeatConfig over a sub-traversal.
func NewRepeat(t Traversal) RepeatConfig {
	return RepeatConfig{Traversal: t, Emit: "None", MaxDepthVal: 100}
}

// Times fixes the iteration count.
func (c RepeatConfig) Times(n int) RepeatConfig { c.TimesVal = &n; return c }

// Until stops when the predicate holds.
func (c RepeatConfig) Until(p Predicate) RepeatConfig { c.UntilVal = &p; return c }

// EmitAll emits every intermediate frontier.
func (c RepeatConfig) EmitAll() RepeatConfig { c.Emit = "All"; return c }

// EmitIf emits frontiers matching the predicate.
func (c RepeatConfig) EmitIf(p Predicate) RepeatConfig {
	c.Emit = "After"
	c.EmitPredicate = &p
	return c
}

// MaxDepth caps the iteration depth.
func (c RepeatConfig) MaxDepth(n int) RepeatConfig { c.MaxDepthVal = n; return c }

// Repeat appends the configured repeat step.
func (t Traversal) Repeat(c RepeatConfig) Traversal {
	var times, until, emitPredicate J
	if c.TimesVal != nil {
		times = *c.TimesVal
	}
	if c.UntilVal != nil {
		until = c.UntilVal.Node
	}
	if c.EmitPredicate != nil {
		emitPredicate = c.EmitPredicate.Node
	}
	return t.push(map[string]J{"Repeat": map[string]J{
		"traversal":      subTraversal(c.Traversal),
		"times":          times,
		"until":          until,
		"emit":           c.Emit,
		"emit_predicate": emitPredicate,
		"max_depth":      c.MaxDepthVal,
	}})
}

// ---------------------------------------------------------------------------
// Ordering and row bindings
// ---------------------------------------------------------------------------

// OrderByMultiple sorts by several (property, "Asc"|"Desc") keys.
func (t Traversal) OrderByMultiple(keys [][2]string) Traversal {
	encoded := make([]J, 0, len(keys))
	for _, key := range keys {
		encoded = append(encoded, []J{key[0], key[1]})
	}
	return t.push(map[string]J{"OrderByMultiple": encoded})
}

// Current targets the row's current element in binding projections.
var Current J = "Current"

// Binding targets a named row binding in binding projections.
func Binding(name string) J { return map[string]J{"Binding": name} }

// BindingProp projects target.source under alias.
func BindingProp(target J, source, alias string) J {
	return map[string]J{
		"kind": "Property", "target": target,
		"source": source, "alias": alias,
	}
}

// BindingRefOf is one (target, source) pair for BindingCoalesce.
func BindingRefOf(target J, source string) J {
	return map[string]J{"target": target, "source": source}
}

// BindingCoalesce projects the first non-null ref under alias.
func BindingCoalesce(refs []J, alias string) J {
	return map[string]J{"kind": "Coalesce", "refs": refs, "alias": alias}
}

// ProjectBindings terminates a Bind()-mode traversal into rows.
func (t Traversal) ProjectBindings(projections []J, distinct bool) Traversal {
	return t.push(map[string]J{"ProjectBindings": map[string]J{
		"projections": projections, "distinct": distinct,
	}})
}

// ---------------------------------------------------------------------------
// Reserved no-op steps (serialize; the engine ignores them)
// ---------------------------------------------------------------------------

// Fold is a reserved no-op step.
func (t Traversal) Fold() Traversal { return t.push("Fold") }

// Unfold is a reserved no-op step.
func (t Traversal) Unfold() Traversal { return t.push("Unfold") }

// Path is a reserved no-op step.
func (t Traversal) Path() Traversal { return t.push("Path") }

// SimplePath is a reserved no-op step.
func (t Traversal) SimplePath() Traversal { return t.push("SimplePath") }

// WithSack is a reserved no-op step carrying an initial value.
func (t Traversal) WithSack(value interface{}) Traversal {
	return t.push(map[string]J{"WithSack": EncodePropertyValue(value)})
}

// SackSet is a reserved no-op step.
func (t Traversal) SackSet(name string) Traversal {
	return t.push(map[string]J{"SackSet": name})
}

// SackAdd is a reserved no-op step.
func (t Traversal) SackAdd(name string) Traversal {
	return t.push(map[string]J{"SackAdd": name})
}

// SackGet is a reserved no-op step.
func (t Traversal) SackGet() Traversal { return t.push("SackGet") }

// ---------------------------------------------------------------------------
// Edge-drop mutations
// ---------------------------------------------------------------------------

// DropEdge deletes all edges from the current nodes to the targets.
func (t Traversal) DropEdge(to J) Traversal {
	return t.pushWrite(map[string]J{"DropEdge": to})
}

// DropEdgeLabeled deletes matching-label edges to the targets.
func (t Traversal) DropEdgeLabeled(to J, label string) Traversal {
	return t.pushWrite(map[string]J{"DropEdgeLabeled": map[string]J{
		"to": to, "label": label,
	}})
}

// DropEdgeByID deletes edges by edge id (multigraph-safe).
func (t Traversal) DropEdgeByID(ref J) Traversal {
	return t.pushWrite(map[string]J{"DropEdgeById": ref})
}
